"""Batch operator library (SURVEY.md §2.1-2.7).

Importing this package registers every batch query in the registry.
"""

from . import scan  # noqa: F401
from . import stateless  # noqa: F401
from . import dedup  # noqa: F401
from . import joins  # noqa: F401
from . import aggregations  # noqa: F401
from . import windows  # noqa: F401
from . import analytic  # noqa: F401
from . import timeseries  # noqa: F401
