"""Deterministic synthetic data (no external data, seeded).

``ensure_synthetic(sf_dir)`` materializes, once, under ``<repo>/data``:

* ``pages/<sf>.parquet``   — Common-Crawl-style pages whose ``text`` embeds
  ssh-auth / apache-CLF / journald-JSON log lines (input_hint schema)
* ``dims/host_country.parquet`` and ``dims/country_code.parquet`` — the
  enrichment dimensions (sf-independent, 253 country codes per the
  reference assertion ``src/models.rs:979``)
"""

from __future__ import annotations

import os

from .dims import write_dims
from .pages import write_pages

def _default_data_dir() -> str:
    """Synthetic-data directory.

    Honors ``$SPARK_GRAFT_DATA_DIR``; otherwise lives under the repo root —
    unless the package is imported from a ``--py-files`` zip (``__file__``
    inside an archive), in which case fall back to the working directory.
    """
    env = os.environ.get("SPARK_GRAFT_DATA_DIR")
    if env:
        return env
    root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    if ".zip" in root:
        return os.path.join(os.getcwd(), "data")
    return os.path.join(root, "data")


DATA_DIR = _default_data_dir()

#: pages per scale factor (≈40 log lines per page)
N_PAGES = {"sf0.001": 120, "sf0.01": 1200, "sf0.1": 12000}
DEFAULT_N_PAGES = 1200
SEED = 42


def sf_name(sf_dir: str) -> str:
    return os.path.basename(os.path.normpath(sf_dir))


def pages_path(sf_dir: str) -> str:
    return os.path.join(DATA_DIR, "pages", f"{sf_name(sf_dir)}.parquet")


def dims_paths() -> dict:
    return {
        "host_country": os.path.join(DATA_DIR, "dims", "host_country.parquet"),
        "country_code": os.path.join(DATA_DIR, "dims", "country_code.parquet"),
    }


def ensure_synthetic(sf_dir: str) -> dict:
    """Generate (if absent) and return paths for pages + dims for ``sf_dir``."""
    name = sf_name(sf_dir)
    n_pages = N_PAGES.get(name, DEFAULT_N_PAGES)
    ppath = pages_path(sf_dir)
    if not os.path.exists(ppath):
        write_pages(ppath, n_pages=n_pages, seed=SEED)
    dpaths = dims_paths()
    if not all(os.path.exists(p) for p in dpaths.values()):
        write_dims(os.path.join(DATA_DIR, "dims"), seed=SEED)
    return {"pages": ppath, **dpaths}
