from .queries import QUERIES, flagship_report  # noqa: F401
from .oracles import ORACLES  # noqa: F401
