from .queries import QUERIES as _CORE, flagship_report  # noqa: F401
from .queries_relational import RELATIONAL_QUERIES as _REL
from .queries_timeseries import TIMESERIES_QUERIES as _TS
from .queries_text import TEXT_QUERIES as _TXT
from .queries_ml import ML_QUERIES as _ML, ML_ORACLES as _O_ML
from .queries_extra import EXTRA_QUERIES as _EXTRA
from .oracles import ORACLES as _O_CORE
from .oracles_ext import ORACLES_EXT as _O_EXT
from .oracles_extra import ORACLES_EXTRA as _O_EXTRA

QUERIES = {**_CORE, **_REL, **_TS, **_TXT, **_ML, **_EXTRA}
ORACLES = {**_O_CORE, **_O_EXT, **_O_ML, **_O_EXTRA}
