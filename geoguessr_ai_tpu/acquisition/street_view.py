"""Google Street View API client: signed URLs, metadata, panorama blocks.

Reference behavior: data/street_view_images_collection/google_api/
street_view.py — HMAC-SHA1 URL signing (:24-35), pano metadata lookup
(:38-52), 4-heading block fetch at a random yaw seed (seed, +90, +180,
+270), 640x640 fov 90 (:78-91, main.py:78-100).  Network calls go through
``requests`` (optional import) so signing/unit logic tests run offline.
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import time
import urllib.parse
from typing import Dict, List, Optional, Tuple

METADATA_URL = "https://maps.googleapis.com/maps/api/streetview/metadata"
IMAGE_URL = "https://maps.googleapis.com/maps/api/streetview"
IMAGE_SIZE = "640x640"
FOV = 90


def sign_url(url: str, secret: str) -> str:
    """Append an HMAC-SHA1 signature (Google URL-signing scheme)."""
    parsed = urllib.parse.urlparse(url)
    to_sign = f"{parsed.path}?{parsed.query}".encode()
    key = base64.urlsafe_b64decode(secret)
    sig = base64.urlsafe_b64encode(
        hmac.new(key, to_sign, hashlib.sha1).digest()
    ).decode()
    return f"{url}&signature={sig}"


def build_image_url(
    lat: float,
    lon: float,
    heading: float,
    api_key: str,
    secret: Optional[str] = None,
    size: str = IMAGE_SIZE,
    fov: int = FOV,
) -> str:
    params = urllib.parse.urlencode(
        {
            "size": size,
            "location": f"{lat},{lon}",
            "heading": f"{heading:.1f}",
            "fov": fov,
            "key": api_key,
            "source": "outdoor",
            "return_error_code": "true",
        }
    )
    url = f"{IMAGE_URL}?{params}"
    return sign_url(url, secret) if secret else url


def build_metadata_url(
    lat: float, lon: float, api_key: str, secret: Optional[str] = None
) -> str:
    params = urllib.parse.urlencode(
        {"location": f"{lat},{lon}", "key": api_key, "source": "outdoor"}
    )
    url = f"{METADATA_URL}?{params}"
    return sign_url(url, secret) if secret else url


class RateLimitError(RuntimeError):
    """HTTP 403 — the reference hard-exits the collection run on this
    (street_view_images_collection/main.py:182-187)."""


def fetch_metadata(
    lat: float,
    lon: float,
    api_key: str,
    secret: Optional[str] = None,
    session=None,
    retries: int = 3,
    backoff: float = 1.0,
) -> Optional[Dict]:
    """Returns metadata dict with status/pano_id/date, or None when no
    imagery exists at the point."""
    import requests

    sess = session or requests
    url = build_metadata_url(lat, lon, api_key, secret)
    for attempt in range(retries):
        resp = sess.get(url, timeout=20)
        if resp.status_code == 403:
            raise RateLimitError("Street View metadata: 403 rate limited")
        if resp.ok:
            meta = resp.json()
            return meta if meta.get("status") == "OK" else None
        time.sleep(backoff * (2**attempt))
    return None


def heading_block(yaw_seed: float) -> List[float]:
    """The 4 headings of a panorama block: seed, +90, +180, +270
    (reference main.py:78-100)."""
    return [(yaw_seed + k * 90.0) % 360.0 for k in range(4)]


def fetch_block(
    lat: float,
    lon: float,
    api_key: str,
    secret: Optional[str] = None,
    yaw_seed: Optional[float] = None,
    session=None,
) -> Tuple[Dict, List[Tuple[float, bytes]]]:
    """Fetch metadata + 4 heading JPEGs.  Returns (metadata, [(heading,
    jpeg_bytes)]).  Raises RateLimitError on 403."""
    import random

    import requests

    sess = session or requests
    meta = fetch_metadata(lat, lon, api_key, secret, session=sess)
    if meta is None:
        return {}, []
    if yaw_seed is None:
        yaw_seed = random.uniform(0, 360)
    images = []
    for heading in heading_block(yaw_seed):
        url = build_image_url(lat, lon, heading, api_key, secret)
        resp = sess.get(url, timeout=30)
        if resp.status_code == 403:
            raise RateLimitError("Street View image: 403 rate limited")
        if resp.ok:
            images.append((heading, resp.content))
    return meta, images
