"""Query-surface translators: Mongo-style filters, projections, and
aggregation pipelines → Catalyst Column expressions / DataFrame transforms."""

from deltalake_spark.functions.filters import translate_filter
from deltalake_spark.functions.pipeline import apply_pipeline
from deltalake_spark.functions.projection import apply_projection

__all__ = ["translate_filter", "apply_projection", "apply_pipeline"]
