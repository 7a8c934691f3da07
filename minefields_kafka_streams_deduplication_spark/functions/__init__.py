"""Scalar-function surface + LLM-data-pipeline operators
(SURVEY.md §2.8; BASELINE.json:6 mandates dedup / similarity search /
multimodal / text analysis as first-class).
"""

from . import text  # noqa: F401
from . import json_dt  # noqa: F401
from . import vectors  # noqa: F401
from . import neardup  # noqa: F401
from . import pipeline  # noqa: F401
from . import unigram_lm  # noqa: F401
from . import ann_index  # noqa: F401  (registers ann_ivf_pq_index_roundtrip)
