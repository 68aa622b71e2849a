"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (nor in sophia_rs_ray) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

# Make the library importable no matter where the driver initialised Ray
# from: register the package for pickle-by-value so worker processes that
# don't have this directory on sys.path can still run our UDFs.
_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
try:
    import sophia_rs_ray as _pkg
    from ray import cloudpickle as _cp

    _cp.register_pickle_by_value(_pkg)
except Exception:  # pragma: no cover — best-effort; driver usually runs in-repo
    pass


def entry() -> Any:
    """Flagship KG-construction pipeline at sf0.001 scale: synthetic
    Common-Crawl-style pages → extract (JSON-LD/microdata/RDFa +
    visible text) → canonical NT triples → exact dedup → sort(S,P,O)."""
    from sophia_rs_ray.pipelines.kg import kg_pipeline
    from sophia_rs_ray.sources.pages import SF_PAGE_COUNTS, pages_dataset

    pages = pages_dataset(SF_PAGE_COUNTS["0.001"])
    return kg_pipeline(pages)


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2."""
    from sophia_rs_ray.pipelines.queries import registry

    return {name: fn for name, (fn, _sql) in registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracles for the SQL-expressible entries (same column names,
    matching rounding). Rows-only entries are omitted on purpose."""
    from sophia_rs_ray.pipelines.queries import registry

    return {name: sql for name, (_fn, sql) in registry().items()
            if sql is not None}
