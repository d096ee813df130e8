"""parq_tools_spark — a PySpark-native analytics engine.

Brand-new implementation of the query/data-processing capabilities of
elphick/parq-tools (reference, read-only at ``/root/reference/``),
re-expressed Spark-first: DataFrame/SQL plans optimized by Catalyst,
distributed Parquet IO, plus large-scale training-data-pipeline
operators (dedup, similarity search, text analysis, multimodal
plumbing) the reference does not have.

The reference exposes its entry points at the package root
(``from parq_tools import filter_parquet_file, ...``); the same
convenience applies here — every file-level operator and the main
DataFrame-level operators are importable from ``parq_tools_spark``.
"""

__version__ = "0.1.0"

from parq_tools_spark.functions.calculated_columns import (  # noqa: F401
    CalculatedColumn,
    with_calculated_columns,
)
from parq_tools_spark.lazy import LazyColumn, LazySparkDF  # noqa: F401
from parq_tools_spark.operators.compare import (  # noqa: F401
    compare_dataframes,
    compare_parquet_files,
)
from parq_tools_spark.operators.concat import (  # noqa: F401
    concat_parquet_files,
    concat_tall,
    concat_wide,
    concat_with_dataframe,
)
from parq_tools_spark.operators.filter import (  # noqa: F401
    filter_dataframe,
    filter_parquet,
)
from parq_tools_spark.operators.index_ops import (  # noqa: F401
    dedupe_exact,
    dedupe_keep_first,
    dedupe_parquet,
    reindex_dataframe,
    reindex_parquet,
    sort_dataframe,
    sort_parquet,
)
from parq_tools_spark.operators.memory import memory_report  # noqa: F401
from parq_tools_spark.operators.skew import (  # noqa: F401
    key_skew_report,
    skew_factor,
)
from parq_tools_spark.operators.dedup import (  # noqa: F401
    contamination_overlap,
    decontaminate,
    dedupe_exact_text,
    dedupe_near_duplicates,
    dedupe_paragraphs,
    incremental_dedupe,
    minhash_index_add,
    minhash_index_query,
    minhash_index_write,
    minhash_lsh_pairs,
    minhash_pairs_between,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from parq_tools_spark.operators.search import (  # noqa: F401
    bm25_index_add,
    bm25_index_build,
    bm25_index_compact,
    bm25_index_maybe_compact,
    bm25_index_stats,
    bm25_index_topk,
    bm25_index_topk_batch,
    bm25_topk,
    bm25_topk_batch,
)
from parq_tools_spark.operators.ann_index import (  # noqa: F401
    ann_index_build,
    ann_index_maybe_compact,
    ann_index_retrain,
    ann_index_stats,
    ann_index_topk,
    semantic_dedupe_bootstrap,
    semantic_dedupe_incremental,
)
from parq_tools_spark.operators.index_facade import (  # noqa: F401
    IndexHandle,
    open_index,
)
from parq_tools_spark.operators.merge import (  # noqa: F401
    apply_cdc,
    merge_upsert,
)
from parq_tools_spark.operators.repetition import (  # noqa: F401
    ngram_repetition_stats,
    with_line_repetition_stats,
    with_word_repetition_stats,
)
from parq_tools_spark.operators.profile import (  # noqa: F401
    ColumnMetadata,
    compare_profiles,
    profile_alerts,
    profile_dataframe,
    render_profile_html,
    save_profile_report,
)
from parq_tools_spark.operators.sampling import (  # noqa: F401
    deterministic_sample,
    hash_split,
    pack_token_shards,
)
from parq_tools_spark.operators.similarity import (  # noqa: F401
    brute_force_pairs,
    brute_force_topk,
    ivf_topk,
    ivf_pq_topk,
    lsh_topk,
    pq_build,
    pq_topk,
    semantic_dedupe,
)
from parq_tools_spark.operators.text import (  # noqa: F401
    bpe_token_count,
    token_count,
    with_clean_text,
    with_fingerprint,
    with_language_id,
    with_quality_score,
    with_text_stats,
)
from parq_tools_spark.operators.schema_tools import (  # noqa: F401
    rename_columns,
    rename_parquet,
)
from parq_tools_spark.session import get_spark  # noqa: F401
from parq_tools_spark.sources.progress import job_progress  # noqa: F401
from parq_tools_spark.sources.zorder import write_zordered  # noqa: F401
from parq_tools_spark.operators.text import with_pii_redacted  # noqa: F401

__all__ = [
    "get_spark",
    "job_progress",
    "write_zordered",
    "with_pii_redacted",
    "pack_token_shards",
    "LazySparkDF",
    "LazyColumn",
    "CalculatedColumn",
    "with_calculated_columns",
    "filter_dataframe",
    "filter_parquet",
    "concat_tall",
    "concat_wide",
    "concat_with_dataframe",
    "concat_parquet_files",
    "sort_dataframe",
    "sort_parquet",
    "reindex_dataframe",
    "reindex_parquet",
    "dedupe_keep_first",
    "dedupe_exact",
    "dedupe_parquet",
    "compare_dataframes",
    "compare_parquet_files",
    "profile_dataframe",
    "profile_alerts",
    "ColumnMetadata",
    "compare_profiles",
    "render_profile_html",
    "save_profile_report",
    "rename_columns",
    "rename_parquet",
    "memory_report",
    "key_skew_report",
    "skew_factor",
    # LLM-pipeline operators
    "contamination_overlap",
    "decontaminate",
    "dedupe_exact_text",
    "dedupe_near_duplicates",
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "simhash_pairs",
    "brute_force_pairs",
    "brute_force_topk",
    "lsh_topk",
    "ivf_topk",
    "with_text_stats",
    "with_quality_score",
    "with_language_id",
    "with_clean_text",
    "with_fingerprint",
    "token_count",
    "bpe_token_count",
    "hash_split",
    "deterministic_sample",
    # round-5 additions
    "dedupe_paragraphs",
    "with_word_repetition_stats",
    "with_line_repetition_stats",
    "ngram_repetition_stats",
    "merge_upsert",
    "apply_cdc",
    "pq_build",
    "pq_topk",
    "ivf_pq_topk",
    "semantic_dedupe",
    "semantic_dedupe_bootstrap",
    "semantic_dedupe_incremental",
    "ann_index_build",
    "ann_index_topk",
    "ann_index_retrain",
    "ann_index_stats",
    "ann_index_maybe_compact",
    "bm25_index_maybe_compact",
    "open_index",
    "IndexHandle",
    "minhash_pairs_between",
    "minhash_index_write",
    "minhash_index_add",
    "minhash_index_query",
    "incremental_dedupe",
    "bm25_topk",
    "bm25_topk_batch",
    "bm25_index_build",
    "bm25_index_add",
    "bm25_index_compact",
    "bm25_index_stats",
    "bm25_index_topk",
    "bm25_index_topk_batch",
]
