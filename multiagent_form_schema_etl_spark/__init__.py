"""PySpark-native analytics engine with the query/data-processing capabilities
of the reference repo ``AyushK0808/multiagent-form-schema-etl`` (see SURVEY.md),
re-expressed Spark-first, plus large-scale LLM-data-pipeline operators
(dedup, similarity search, multimodal columns, text analysis).

Everything deterministic is pure DataFrame/Spark SQL so Catalyst/Tungsten/AQE
optimize it; model/external calls sit behind strategy interfaces whose defaults
are deterministic (SURVEY.md §7).
"""

__version__ = "0.1.0"
