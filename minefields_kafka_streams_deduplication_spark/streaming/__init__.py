"""Structured Streaming operators (SURVEY.md §2.3 D4/D5, §2.6 W4/W5,
§3.4) — the direct analog of the reference's poll-loop + RocksDB design
[R o.a.k.streams.KafkaStreams run loop; BASELINE.json:7 mandates
"Structured Streaming + deduplication via watermarks/state"].
"""

from . import anomaly_stream  # noqa: F401
from . import dedup_stream  # noqa: F401
from . import observe  # noqa: F401
from . import neardup_stream  # noqa: F401
from . import punctuate  # noqa: F401
from . import suppress  # noqa: F401
from . import windows_stream  # noqa: F401
from . import drift  # noqa: F401  (registers drift_stream_psi)
from . import global_table  # noqa: F401  (registers join_global_table_refresh)
from . import expectations  # noqa: F401  (registers validate_stream_gate)
from . import live_state  # noqa: F401  (registers store_live_streaming_state)
from . import dlq  # noqa: F401  (registers kafka_stream_dlq_routing)
from . import session_incremental  # noqa: F401  (registers session_frame_incremental)
from . import state_migration  # noqa: F401  (registers store_migrated_session_fetch)
