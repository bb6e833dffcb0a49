"""qamd_spark — a from-scratch PySpark-native transcript quality-filter engine.

Reimagines the check-suite semantics of ukdataservice/qamd (QAMyData, a Rust
CLI of declarative pass/fail data-quality checks; see /root/reference) as a
conversation-transcript quality pipeline: a declarative rule registry
(odd-character ratio, stop-word fraction, length/repetition bounds,
duplicate-turn detection, outlier stats), hashed char-n-gram language ID,
KenLM-style hashed-trigram perplexity, and regex PII/toxicity scrubbing —
all evaluated with native Spark Column expressions plus vectorized
pandas/Arrow UDFs (no per-row Python), over parquet/Iceberg tables of
multi-turn transcripts.

Architecture is Spark-first (DataFrame + Catalyst), NOT a port of the
reference's single-threaded streaming-callback engine.
"""

__version__ = "0.1.0"
