"""The §2 query suite: every operator in SURVEY.md §2 with a `queries()`
entry registers here; oracle-SQL twins (DuckDB dialect) register alongside.

Import the submodules for their registration side effects.
"""

from .registry import QUERIES, ORACLES, query  # noqa: F401
from . import tpch  # noqa: F401,E402
from . import tpch2  # noqa: F401,E402
from . import tpch3  # noqa: F401,E402
from . import temporal  # noqa: F401,E402
from . import etl  # noqa: F401,E402
from . import llm  # noqa: F401,E402
from . import streaming_q  # noqa: F401,E402
from . import breadth  # noqa: F401,E402
from . import breadth2  # noqa: F401,E402
from . import breadth3  # noqa: F401,E402
from . import breadth4  # noqa: F401,E402
from . import breadth5  # noqa: F401,E402
from . import breadth6  # noqa: F401,E402
from . import breadth7  # noqa: F401,E402
from . import breadth8  # noqa: F401,E402
from . import breadth9  # noqa: F401,E402
from . import breadth10  # noqa: F401,E402
from . import breadth11  # noqa: F401,E402
from . import breadth12  # noqa: F401,E402
from . import invariants  # noqa: F401,E402
from . import curation  # noqa: F401,E402
from . import breadth13  # noqa: F401,E402
from . import breadth14  # noqa: F401,E402
from . import breadth15  # noqa: F401,E402
from . import breadth16  # noqa: F401,E402
from . import breadth17  # noqa: F401,E402
from . import breadth18  # noqa: F401,E402
from . import breadth19  # noqa: F401,E402
from . import breadth20  # noqa: F401,E402
from . import breadth21  # noqa: F401,E402
from . import breadth22  # noqa: F401,E402
from . import breadth23  # noqa: F401,E402
from . import breadth24  # noqa: F401,E402
from . import breadth25  # noqa: F401,E402
from . import breadth26  # noqa: F401,E402
from . import breadth27  # noqa: F401,E402
from . import breadth28  # noqa: F401,E402
from . import breadth29  # noqa: F401,E402
from . import breadth30  # noqa: F401,E402
from . import breadth31  # noqa: F401,E402
from . import breadth32  # noqa: F401,E402
from . import breadth33  # noqa: F401,E402
from . import breadth34  # noqa: F401,E402
from . import breadth35  # noqa: F401,E402
from . import breadth36  # noqa: F401,E402
from . import breadth37  # noqa: F401,E402
from . import breadth38  # noqa: F401,E402
from . import breadth39  # noqa: F401,E402
from . import breadth40  # noqa: F401,E402
from . import breadth41  # noqa: F401,E402
from . import breadth42  # noqa: F401,E402
from . import breadth44  # noqa: F401,E402
from . import breadth45  # noqa: F401,E402
