"""PySpark-native transactional lakehouse engine.

A brand-new DataFrame-first re-expression of the query and data-processing
capabilities of Apache Hudi 0.12.0 (reference fork: gaosh96/hudi-0.12.0-my):
keyed tables on Parquet, COW/MOR, commit timeline, snapshot / incremental /
read-optimized / time-travel queries, pluggable merge payloads, table services,
config-driven streaming CDC ingestion, plus LLM-data-pipeline operators.
"""

from __future__ import annotations

from .config import TableConfig
from .engine import Engine
from .table import LakeTable
from .compat import read_hudi, write_hudi

__all__ = ["Engine", "LakeTable", "TableConfig", "read_hudi", "write_hudi"]
__version__ = "0.1.0"
