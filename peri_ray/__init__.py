"""peri_ray — a Ray-Data-native schema + constraint validation engine.

Re-expresses the semantics of zoedsoupe/peri (an Elixir single-record
schema validator, reference at /root/reference) as compiled vectorized
Arrow predicates evaluated in ``ray.data.Dataset.map_batches``, extended
with the table-level operators mandated by BASELINE.json's north rule:
column statistics (count/null/min/max/KLL/HLL), uniqueness, referential
and distribution-drift checks, per-partition verdicts with checkpoint /
resume, plus large-scale training-data operators (dedup, similarity
search, text analysis).

Not a port: the reference's per-record recursive interpreter becomes a
compile-once rule plan whose kernels run over whole Arrow columns.
"""

import os as _os

# Keep per-process hidden parallelism in check: Ray schedules by
# num_cpus *tokens*, so untracked thread pools (pyarrow IO: 8 threads,
# polars: all cores) oversubscribe the host and wreck scaling
# measurements.  Compute threads are already capped by OMP_NUM_THREADS=1
# in Ray workers.
if _os.environ.get("PERI_RAY_CAP_THREADS", "1") == "1":
    _os.environ.setdefault("POLARS_MAX_THREADS", "1")
    try:
        import pyarrow as _pa

        _pa.set_io_thread_count(int(_os.environ.get("PERI_RAY_IO_THREADS", "2")))
    except Exception:
        pass

from peri_ray.errors import (
    InvalidSchemaError,
    summarize,
    traverse_violations,
    violation_to_map,
)
from peri_ray.spec import validate_spec, conforms_spec, vec
from peri_ray.compile import compile_spec, Plan
from peri_ray.validate import (
    validate_batch,
    validate_dataset,
    violations_dataset,
    validated_dataset,
    conforms,
)
from peri_ray.registry import (
    Schema,
    ValidationError,
    defschema,
    get_schema,
    schema_registry,
)
from peri_ray.specgen import generate_table, generate_dataset
from peri_ray.compat import spec_compat, is_backward_compatible

__all__ = [
    "spec_compat",
    "is_backward_compatible",
    "generate_table",
    "generate_dataset",
    "traverse_violations",
    "violation_to_map",
    "InvalidSchemaError",
    "summarize",
    "validate_spec",
    "conforms_spec",
    "vec",
    "compile_spec",
    "Plan",
    "validate_batch",
    "validate_dataset",
    "violations_dataset",
    "validated_dataset",
    "conforms",
    "Schema",
    "ValidationError",
    "defschema",
    "get_schema",
    "schema_registry",
]
