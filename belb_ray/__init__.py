"""belb_ray — a Ray-Data-native entity-resolution / record-linkage engine.

Built from scratch (NOT a port) with the query and data-processing
capabilities of the BELB benchmark builder (sg-wbi/belb): mention
normalization to canonical identifiers, synonym/homonym expansion,
identifier-history resolution, cross-source ID mapping, and transitive
identity clustering — re-expressed as ``ray.data.Dataset`` pipelines of
``map_batches`` over zero-copy Arrow batches, stateful actor pools, and
``groupby``/``sort`` shuffles, designed for 10^12-file scale.

Reference semantics are cited per-module as ``file:line`` into
``/root/reference`` (see SURVEY.md).
"""

__version__ = "0.1.0"

import logging as _logging


class _SchemaHashNoiseFilter(_logging.Filter):
    """Drop Ray's benign "Failed to hash the schemas (for deduplication)"
    warning (ray/data/_internal/arrow_ops/transform_pyarrow.py): parquet
    schema metadata carrying a dict is unhashable, Ray falls back to the
    full unify path, and the warning floods every read-heavy log without
    signalling anything actionable."""

    def filter(self, record: _logging.LogRecord) -> bool:  # pragma: no cover
        return "Failed to hash the schemas" not in record.getMessage()


_logging.getLogger(
    "ray.data._internal.arrow_ops.transform_pyarrow"
).addFilter(_SchemaHashNoiseFilter())
