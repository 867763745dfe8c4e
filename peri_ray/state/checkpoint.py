"""[NORTH] Per-partition checkpoint manifests + resume logic.

"Resumable from checkpoint" for a batch pipeline (ray_guide "Sources &
sinks"; SURVEY §4.2): output is laid out one directory per input
fragment, each written atomically (temp dir + rename), with a small JSON
manifest recording lineage — the input fragment, the rule-plan hash, row
counts, per-rule outcomes and output paths.  A rerun lists manifests,
skips fragments whose manifest matches ``(fragment, plan_hash)``, and
re-runs only the rest.  Kernels are pure/deterministic, so re-running a
fragment is idempotent.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import tempfile
import time
from typing import Any, Callable


def plan_hash(spec: Any) -> str:
    """Stable hash of a rule-spec (callables hash by qualname so edits to
    unrelated code don't invalidate checkpoints, but swapping a callback
    does change the plan identity)."""

    def norm(x):
        if callable(x):
            return f"<fn:{getattr(x, '__module__', '?')}.{getattr(x, '__qualname__', repr(x))}>"
        if isinstance(x, dict):
            return {str(k): norm(v) for k, v in sorted(x.items(), key=lambda kv: str(kv[0]))}
        if isinstance(x, (list, tuple)):
            return [norm(v) for v in x]
        return x

    blob = json.dumps(norm(spec), sort_keys=True, default=str).encode()
    return hashlib.sha256(blob).hexdigest()[:16]


def _enc_spec(x: Any) -> dict:
    """Structure-preserving JSON encoding of a spec (tuples tagged so
    decode restores them — ``plan_hash.norm`` flattens tuples to lists
    and can't be compared by ``compat.spec_compat``).  Callables encode
    to their qualname marker (same identity rule as ``plan_hash``);
    other non-JSON scalars (dates) to ``str``."""
    if callable(x):
        return {"#": "f", "v": f"<fn:{getattr(x, '__module__', '?')}."
                              f"{getattr(x, '__qualname__', repr(x))}>"}
    if isinstance(x, dict):
        return {"#": "d", "v": [[str(k), _enc_spec(v)]
                                for k, v in sorted(
                                    x.items(), key=lambda kv: str(kv[0]))]}
    if isinstance(x, tuple):
        return {"#": "t", "v": [_enc_spec(v) for v in x]}
    if isinstance(x, list):
        return {"#": "l", "v": [_enc_spec(v) for v in x]}
    if x is None or isinstance(x, (str, int, float, bool)):
        return {"#": "s", "v": x}
    return {"#": "o", "v": str(x)}


def _dec_spec(e: dict) -> Any:
    tag, v = e["#"], e["v"]
    if tag == "d":
        return {k: _dec_spec(sub) for k, sub in v}
    if tag == "t":
        return tuple(_dec_spec(sub) for sub in v)
    if tag == "l":
        return [_dec_spec(sub) for sub in v]
    return v  # "s" scalar, "f" marker string, "o" repr string


class CheckpointDir:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(os.path.join(root, "manifests"), exist_ok=True)
        os.makedirs(os.path.join(root, "data"), exist_ok=True)

    # -- manifests ---------------------------------------------------------
    @staticmethod
    def _safe(fragment_id: str) -> str:
        """Filesystem-safe name that stays INJECTIVE: '/' and ':' both
        mapped to '_' alone collides 'a/b' with 'a_b' (distinct inputs
        would silently share a manifest and one would be skipped as
        done) — an 8-hex digest of the raw id disambiguates."""
        tag = hashlib.sha256(fragment_id.encode()).hexdigest()[:8]
        return fragment_id.replace("/", "_").replace(":", "_") + "-" + tag

    def _manifest_path(self, fragment_id: str) -> str:
        return os.path.join(self.root, "manifests",
                            f"{self._safe(fragment_id)}.json")

    def completed(self, fragment_id: str, phash: str) -> bool:
        p = self._manifest_path(fragment_id)
        if not os.path.exists(p):
            return False
        try:
            with open(p) as f:
                m = json.load(f)
            return m.get("plan_hash") == phash and m.get("status") == "done"
        except (json.JSONDecodeError, OSError):
            return False

    # -- spec snapshots (compat-aware resume) -----------------------------
    def save_spec(self, phash: str, spec: Any) -> None:
        """Snapshot the spec behind a plan hash (once), so a later
        resume under a DIFFERENT spec can run ``compat.spec_compat``
        against what each manifest was actually computed with."""
        d = os.path.join(self.root, "specs")
        os.makedirs(d, exist_ok=True)
        p = os.path.join(d, f"{phash}.json")
        if os.path.exists(p):
            return
        fd, tmp = tempfile.mkstemp(dir=d)
        with os.fdopen(fd, "w") as f:
            json.dump(_enc_spec(spec), f)
        os.replace(tmp, p)

    def load_spec(self, phash: str) -> Any | None:
        p = os.path.join(self.root, "specs", f"{phash}.json")
        if not os.path.exists(p):
            return None
        try:
            with open(p) as f:
                return _dec_spec(json.load(f))
        except (json.JSONDecodeError, OSError, KeyError, TypeError):
            return None

    def completed_compat(self, fragment_id: str, phash: str, spec: Any,
                         mode: str = "permissive") -> bool:
        """Opt-in widening of :meth:`completed`: also accept a 'done'
        manifest computed under a DIFFERENT plan when (a) that plan's
        spec snapshot exists, (b) ``compat.is_backward_compatible(old,
        new)`` — the new spec can only widen validity — and (c) the
        manifest records a fully CLEAN fragment (``rows ==
        valid_rows``).  (c) is what makes reuse sound: a loosened spec
        can flip old-INVALID rows to valid, so a fragment with any
        recorded violation must re-run; a clean fragment's rows all
        stay valid by (b), so its outputs and verdict are already
        exactly what the new plan would produce."""
        p = self._manifest_path(fragment_id)
        if not os.path.exists(p):
            return False
        try:
            with open(p) as f:
                m = json.load(f)
        except (json.JSONDecodeError, OSError):
            return False
        if m.get("status") != "done":
            return False
        if m.get("plan_hash") == phash:
            return True
        old_spec = self.load_spec(m.get("plan_hash", ""))
        if old_spec is None:
            return False
        rows, ok = m.get("rows"), m.get("valid_rows")
        if rows is None or ok is None or rows != ok:
            return False
        from peri_ray.compat import is_backward_compatible

        # normalize the NEW spec through the same encoding so unchanged
        # callables compare equal by qualname marker
        new_cmp = _dec_spec(_enc_spec(spec))
        return is_backward_compatible(old_spec, new_cmp, mode)

    def write_manifest(self, fragment_id: str, phash: str, payload: dict[str, Any]) -> None:
        """Atomic: write temp file then rename (a crashed run never leaves
        a half-manifest that a resume would trust)."""
        p = self._manifest_path(fragment_id)
        record = {
            "fragment": fragment_id,
            "plan_hash": phash,
            "status": "done",
            "written_at": time.time(),
            **payload,
        }
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(p))
        with os.fdopen(fd, "w") as f:
            json.dump(record, f)
        os.replace(tmp, p)

    def read_manifests(self) -> list[dict[str, Any]]:
        out = []
        mdir = os.path.join(self.root, "manifests")
        for name in sorted(os.listdir(mdir)):
            if name.endswith(".json"):
                with open(os.path.join(mdir, name)) as f:
                    out.append(json.load(f))
        return out

    # -- atomic data dirs --------------------------------------------------
    def fragment_dir(self, fragment_id: str) -> str:
        return os.path.join(self.root, "data", self._safe(fragment_id))

    def invalidate(self, fragment_id: str) -> None:
        """Remove the fragment's manifest.  MUST run before its data dir
        is touched: a stale 'done' manifest outliving a destroyed data
        dir would make a later resume skip a fragment whose output no
        longer exists."""
        p = self._manifest_path(fragment_id)
        if os.path.exists(p):
            os.remove(p)

    def write_fragment(self, fragment_id: str, write_fn: Callable[[str], Any]) -> str:
        """Run ``write_fn(tmp_dir)`` then atomically rename into place.
        The manifest is invalidated FIRST — if the rewrite fails after
        the old data dir is removed, the fragment reads as incomplete
        (and simply reprocesses), never as done-but-dataless."""
        self.invalidate(fragment_id)
        final = self.fragment_dir(fragment_id)
        if os.path.exists(final):
            shutil.rmtree(final)
        tmp = final + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        os.makedirs(tmp)
        write_fn(tmp)
        os.replace(tmp, final)
        return final


def run_partitioned(
    fragments: list[str],
    ckpt: CheckpointDir,
    phash: str,
    process: Callable[[str, str], dict[str, Any]],
) -> list[dict[str, Any]]:
    """Resume loop: for each input fragment, skip if its manifest matches
    the plan hash, else process(fragment, out_dir) and record the
    manifest.  Returns all manifests (completed + fresh)."""
    results = []
    for frag in fragments:
        if ckpt.completed(frag, phash):
            continue
        holder: dict[str, Any] = {}

        def _write(tmp_dir, _frag=frag):
            holder.update(process(_frag, tmp_dir))

        ckpt.write_fragment(frag, _write)
        ckpt.write_manifest(frag, phash, holder)
        results.append(holder)
    return ckpt.read_manifests()
