"""Open-data extractor — portable equivalent of the reference's
driver-side downloader (extraction_to_local.py:1-47).

The reference walks a CKAN-style metastore API response, derives a
``transport_YYYY-MM.csv`` filename from the date range embedded in each
distribution's download URL, and writes the bytes locally. The network
step is gated behind an import-try (offline environments); the filename
derivation — the only logic — is a pure function with unit tests.
"""

from __future__ import annotations

import os
import re
from urllib.parse import unquote

# "<dd>-<mm>-<yyyy> to" range prefix inside the URL (reference :34-39).
_DATE_RANGE_RE = re.compile(r"(\d{2})-(\d{2})-(\d{4})\s+to")


def derive_filename(download_url: str, prefix: str = "transport") -> str:
    """URL with an embedded '<dd>-<mm>-<yyyy> to ...' range →
    '<prefix>_YYYY-MM.csv'; falls back to the URL basename when no range
    is present."""
    decoded = unquote(download_url)
    m = _DATE_RANGE_RE.search(decoded)
    if m:
        _, month, year = m.groups()
        return f"{prefix}_{year}-{month}.csv"
    base = os.path.basename(decoded.split("?", 1)[0])
    return base or f"{prefix}_unknown.csv"


def list_distribution_urls(api_payload: dict) -> list[str]:
    """Download URLs from a CKAN-like dataset payload
    (payload['distribution'][*]['downloadURL'], reference :15-23)."""
    return [
        d["downloadURL"]
        for d in api_payload.get("distribution", [])
        if d.get("downloadURL")
    ]


def download_monthly_csvs(api_url: str, dest_dir: str) -> list[str]:  # pragma: no cover
    """Fetch the metastore payload and download each distribution.
    Network access required; raises a clear error when requests is
    unavailable or offline."""
    try:
        import requests
    except ImportError as exc:
        raise RuntimeError("the extractor needs the 'requests' package") from exc
    os.makedirs(dest_dir, exist_ok=True)
    payload = requests.get(api_url, timeout=60).json()
    written = []
    for url in list_distribution_urls(payload):
        name = derive_filename(url)
        path = os.path.join(dest_dir, name)
        with open(path, "wb") as fh:
            fh.write(requests.get(url, timeout=300).content)
        written.append(path)
    return written
