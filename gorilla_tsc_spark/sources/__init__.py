from .tables import TABLES, load_table, register_views
from .transcripts import (
    TRANSCRIPTS_SQL_TEMPLATE,
    synthesize_transcripts,
    transcripts_from_events,
    transcripts_oracle_sql,
)

__all__ = [
    "TABLES", "load_table", "register_views",
    "transcripts_from_events", "transcripts_oracle_sql",
    "TRANSCRIPTS_SQL_TEMPLATE", "synthesize_transcripts",
]
