from hjsonschema_spark.sources.transcripts import (  # noqa: F401
    ROLE_VOCAB,
    TOOL_VOCAB,
    TranscriptGen,
    role_vocab_df,
    tool_vocab_df,
)
