"""searchenginepp_ray — a Ray-Data-native inverted-index build + BM25/TF-IDF
top-k query engine, built from scratch with the query/data-processing
capabilities of the C++ reference engine (scarburato/searchenginepp), plus
large-scale training-data pipeline operators (dedup, similarity search,
text analysis, multimodal plumbing)."""

__version__ = "0.1.0"
