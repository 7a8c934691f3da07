"""Source/sink surface (SURVEY.md §2.1).

Batch sources live in `catalog` (S1/S2/S3 analogs); the streaming source
is `streaming.source.read_events_stream`. This package adds the sink
half (S4: KStream#to analog) and multi-format readers.
"""

from .sinks import (  # noqa: F401
    write_parquet,
    write_partitioned_parquet,
    write_bucketed_table,
)
from .formats import read_any, SUPPORTED_FORMATS  # noqa: F401
from .kafka import (  # noqa: F401
    events_from_kafka,
    events_to_kafka,
    parse_event_payload,
    serialize_event_payload,
)
from . import sinks  # noqa: F401  (registers sink_parquet_roundtrip)
from . import state_store  # noqa: F401  (registers interactive-query lookups)
from .state_store import (  # noqa: F401
    materialize_keyed_store,
    materialize_versioned_store,
    store_get,
    store_range,
    store_all,
    store_approx_count,
    versioned_store_get,
)
from . import layout  # noqa: F401  (registers zorder_box_query)
from . import snapshots  # noqa: F401  (registers store_snapshot_diff)
from .layout import morton_key, quantize, write_zorder  # noqa: F401
