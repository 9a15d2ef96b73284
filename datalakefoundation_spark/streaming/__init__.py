from datalakefoundation_spark.streaming.lake_source import (  # noqa: F401
    LakeStreamDataSource,
)
from datalakefoundation_spark.streaming.ops import (  # noqa: F401
    detect_hot_keys,
    detect_hot_keys_rolling,
    finalize_corpus,
    read_clean_corpus_output,
    read_event_stream,
    reconcile_clean_corpus,
    salted_stream_stream_join,
    session_overlap_join,
    sessionize,
    stream_clean_corpus,
    stream_dedup,
    stream_dedup_index,
    stream_hot_key_calibration,
    stream_merge_to_silver,
    stream_to_lake,
    windowed_counts,
    windowed_stream_join,
)
