"""Synthetic geo-caption generation for CLIP contrastive pretraining.

Reference behavior: pretrain_idun.py:29-174 + backend/metadata.py — captions
combine country/region (with "the"-prefix countries), Köppen climate zone,
driving side and capture month, each included at random so CLIP sees varied
descriptions of similar images.  Randomness is driven by a passed-in
``random.Random`` so caption streams are reproducible per seed.
"""

from __future__ import annotations

import random
from typing import Dict, Optional

# Köppen-Geiger climate-zone descriptions (reference backend/metadata.py:9-40)
CLIMATE_DICT: Dict[int, str] = {
    1: "a tropical rainforest climate",
    2: "a tropical monsoon climate",
    3: "a tropical savanna climate",
    4: "an arid, hot desert climate",
    5: "an arid, cold desert climate",
    6: "a hot, semi-arid climate",
    7: "a cold, semi-arid climate",
    8: "a Mediterranean climate with a hot summer",
    9: "a Mediterranean climate with a warm summer",
    10: "a Mediterranean climate with a cold summer",
    11: "a humid subtropical monsoon climate",
    12: "a temperate oceanic monsoon climate",
    13: "a subpolar oceanic monsoon climate",
    14: "a humid subtropical climate",
    15: "a temperate oceanic climate",
    16: "a subpolar oceanic climate",
    17: "a Mediterranean humid continental climate with a hot summer",
    18: "a Mediterranean humid continental climate with a warm summer",
    19: "a Mediterranean subarctic climate with a cold summer",
    20: "a Mediterranean humid continental climate with a warm summer",
    21: "a humid continental monsoon climate with a hot summer",
    22: "a humid continental monsoon climate with a warm summer",
    23: "a subarctic monsoon climate",
    24: "an extremely cold subarctic monsoon climate",
    25: "a humid continental climate with a hot summer",
    26: "a humid continental climate with a warm summer",
    27: "a subarctic climate",
    28: "an extremely cold subarctic climate",
    29: "a polar tundra climate",
    30: "a polar ice cap climate",
}

MONTHS: Dict[str, str] = {
    "01": "January", "02": "February", "03": "March", "04": "April",
    "05": "May", "06": "June", "07": "July", "08": "August",
    "09": "September", "10": "October", "11": "November", "12": "December",
}

#: Countries/territories that read naturally with a "the" prefix
#: (reference pretrain_idun.py:29-52).
THE_COUNTRIES = frozenset(
    {
        "Bahamas", "British Virgin Islands", "Cayman Islands",
        "Cocos Islands", "Comoros", "Cook Islands", "Falkland Islands",
        "Faroe Islands", "French Southern Territories", "Maldives",
        "Marshall Islands", "Netherlands", "Northern Mariana Islands",
        "Paracel Islands", "Philippines", "Pitcairn Islands", "Seychelles",
        "Solomon Islands", "Spratly Islands", "Turks and Caicos Islands",
        "United Arab Emirates", "United States",
    }
)

#: Left-hand-traffic countries (reference pretrain/leftdrive_countries.py).
LEFT_DRIVE = frozenset(
    {
        "Australia", "Bangladesh", "Bermuda", "Bhutan", "Botswana",
        "Christmas Island", "Cocos Islands", "Eswatini", "Hong Kong",
        "India", "Indonesia", "Ireland", "Isle of Man", "Japan", "Jersey",
        "Kenya", "Lesotho", "Macau", "Malaysia", "Malta", "Namibia",
        "Nepal", "New Zealand", "Pitcairn Islands", "Singapore",
        "South Africa", "Sri Lanka", "Thailand", "Uganda",
        "United Kingdom", "United States Virgin Islands", "England",
        "Wales", "Scotland",
    }
)


def drives_on_right(country: Optional[str]) -> Optional[bool]:
    if not country:
        return None
    return country not in LEFT_DRIVE


def _valid(x) -> bool:
    if x is None:
        return False
    try:
        import math

        if isinstance(x, float) and math.isnan(x):
            return False
    except Exception:
        pass
    return str(x).strip() != ""


def select_caption(
    sample: Dict,
    rng: Optional[random.Random] = None,
) -> str:
    """Build one randomized caption from an enriched sample dict.

    Expected keys (all optional): lat, lon, capture_date, country, region,
    town, climate_zone (description string), drive_right (bool), month
    (name).  Reference behavior: pretrain_idun.py:71-174.
    """
    rng = rng or random
    country = sample.get("country")
    if country == "United States Of America":
        country = "United States"
    country_str = f"the {country}" if country in THE_COUNTRIES else country

    region = sample.get("region")
    town = sample.get("town")

    if _valid(country_str):
        region_str = (
            f"in the region of {region} "
            if _valid(region) and rng.random() > 0.4
            else ""
        )
        town_str = (
            f"close to the town of {town} "
            if _valid(town) and rng.random() > 0.6
            else ""
        )
        location = (
            f"A Street View photo {town_str}{region_str}in {country_str}."
        )
    elif _valid(sample.get("lat")) and _valid(sample.get("lon")):
        location = (
            f"A Street View photo taken around latitude "
            f"{float(sample['lat']):.3f}, longitude "
            f"{float(sample['lon']):.3f}."
        )
    else:
        location = "A Street View photo."

    climate = sample.get("climate_zone")
    climate_part = (
        f" This location has {str(climate).lower()}."
        if _valid(climate) and rng.random() > 0.6
        else ""
    )

    drive_right = sample.get("drive_right")
    drive_part = ""
    if (
        drive_right is not None
        and _valid(country_str)
        and climate_part == ""
        and rng.random() > 0.7
    ):
        side = "right" if drive_right else "left"
        drive_part = (
            f" In this location, people drive on the {side} side of the road."
        )

    month_part = ""
    month = sample.get("month")
    capture_date = sample.get("capture_date")
    if _valid(month) and rng.random() > 0.7:
        month_part = f" The photo was taken in {month}."
    elif _valid(capture_date) and rng.random() > 0.7:
        code = str(capture_date)[5:7]
        month_part = f" The photo was taken in {MONTHS.get(code, code)}."

    extras = [climate_part, drive_part, month_part]
    rng.shuffle(extras)
    return (location + "".join(extras)).strip()


def enrich_dataframe(df, geocell_manager=None, climate_raster=None,
                     store=None):
    """Attach caption metadata columns to a per-image DataFrame:
    month (from capture_date/batch_date), country/region (geocell manager),
    drive_right, climate_zone (Köppen raster, requires rasterio).

    When no local ``climate_raster`` is given but an ObjectStore is, the
    raster self-provisions from the store (reference downloads it before
    enrichment, backend/s3bucket.py:1399-1404 via pretrain_idun.py:329);
    fetch failures degrade to captions without a climate clause.

    Reference behavior: pretrain_idun.py:327-338 + backend/metadata.py.
    """
    if climate_raster is None and store is not None:
        try:
            climate_raster = store.download_climate_file()
        except Exception:
            climate_raster = None
    df = df.copy()
    date_col = (
        "capture_date" if "capture_date" in df.columns else "batch_date"
    )
    if date_col in df.columns:
        df["month"] = (
            df[date_col].astype(str).str[5:7].map(MONTHS).fillna("")
        )
    if geocell_manager is not None:
        cells, countries, regions = [], [], []
        for lat, lon in zip(df["lat"], df["lon"]):
            cell, country, region = geocell_manager.get_geocell_id(
                {"latitude": lat, "longitude": lon}
            )
            cells.append(cell)
            countries.append(country)
            regions.append(region)
        df["cell"] = cells
        df["country"] = countries
        df["region"] = regions
        df["drive_right"] = [drives_on_right(c) for c in countries]
    if climate_raster is not None:
        df = sample_koppen(df, climate_raster, CLIMATE_DICT)
        df = df.rename(columns={"climate": "climate_zone"})
    return df


def sample_koppen(df, raster_path: str, legend_map=None):
    """Köppen raster sampling (reference backend/metadata.py:43-66).
    Requires rasterio + pyproj (optional deps)."""
    import rasterio
    from pyproj import Transformer
    from rasterio.transform import rowcol

    df = df.copy()
    with rasterio.open(raster_path) as src:
        to_raster = Transformer.from_crs(
            "EPSG:4326", src.crs, always_xy=True
        )
        band1 = src.read(1)
        vals = []
        for lon, lat in zip(df["lon"].values, df["lat"].values):
            x, y = to_raster.transform(lon, lat)
            r, c = rowcol(src.transform, x, y)
            if 0 <= r < src.height and 0 <= c < src.width:
                val = band1[r, c]
                if legend_map is not None:
                    val = legend_map.get(int(val))
            else:
                val = None
            vals.append(val)
    df["climate"] = vals
    return df
