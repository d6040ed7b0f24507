"""Unit conversion system.

Same semantics as the reference (unit_utils.py:208-254): a units spec is
``units=(distance, time, time2)`` (or a bare distance string); conversion
resolves to four scalar factors applied as

    dist_in_units   = raw_dist * crs_conv / d_conv
    speed_in_units  = dist_in_units / dt_seconds * t_conv
    accel_in_units  = d(speed) / dt_seconds * t2_conv

Factors become literal columns at plan-build time (constant folding —
no runtime lookup). Covers the reference's FULL unit table
(unit_utils.py:12-198) — the factors are public EPSG unit-of-measure
conversions (EPSG codes noted per entry in the reference).
"""

from collections import namedtuple

UNITS = namedtuple("UNITS", "distance time time2 crs", defaults=(None,) * 4)

# (abbr, meters-per-unit, crs fullname) — reference DISTANCE_UNIT_LIST
_DISTANCE_TABLE = [
    ("km", 1000.0, "Kilometer"),
    ("m", 1.0, "metre"),
    ("dm", 0.1, "Decimeter"),
    ("cm", 0.01, "Centimeter"),
    ("mm", 0.001, "Millimeter"),
    ("nm", 1852.0, "International Nautical Mile"),
    ("inch", 0.0254, "International Inch"),
    ("ft", 0.3048, "International Foot"),
    ("yd", 0.9144, "International Yard"),
    ("mi", 1609.344, "International Statute Mile"),
    ("link", 0.201168, "International Link"),
    ("chain", 20.1168, "International Chain"),
    ("fathom", 1.8288, "International Fathom"),
    ("british_ft", 0.304799471538676, "British foot (Sears 1922)"),
    ("british_yd", 0.914398414616029, "British yard (Sears 1922)"),
    ("british_chain_sears", 20.11677651215526, "British chain (Sears 1922)"),
    ("british_link_sears", 0.20116767651215526, "British link (Sears 1922)"),
    ("sears_yd", 0.914398414616029, "Yard (Sears)"),
    ("link_sears", 0.20116767651215526, "Link (Sears)"),
    ("chain_sears", 20.11677651215526, "Chain (Sears)"),
    ("british_ft_sears_truncated", 0.914398, "British foot (Sears 1922 truncated)"),
    ("british_chain_sears_truncated", 20.11676, "British chain (Sears 1922 truncated)"),
    ("british_chain_benoit", 20.116782494375872, "British chain (Benoit 1895 B)"),
    ("chain_benoit", 20.116782494375872, "Chain (Benoit)"),
    ("link_benoit", 0.20116782494375872, "Link (Benoit)"),
    ("clarke_yd", 0.9143917962, "Clarke's yard"),
    ("clarke_ft", 0.3047972654, "Clarke's Foot"),
    ("clarke_link", 0.201166195164, "Clarke's link"),
    ("clarke_chain", 20.1166195164, "Clarke's chain"),
    ("british_ft_1936", 0.3048007491, "British foot (1936)"),
    ("gold_coast_ft", 0.3047997101815, "Gold Coast foot"),
    ("rod", 0.1988387815, "Rod"),
    ("furlong", 201.168, "Furlong"),
    ("german_m", 1.0000135965, "German legal metre"),
    ("survey_in", 0.0254000508001016, "US survey inch"),
    ("survey_ft", 0.3048006096012192, "US survey foot"),
    ("survey_yd", 0.9144018288036575, "US survey yard"),
    ("survey_lk", 0.20116840233680463, "US survey link"),
    ("survey_ch", 20.116840233680463, "US survey chain"),
    ("survey_mi", 1609.3472186944373, "US survey mile"),
    ("indian_yd", 0.914398530744441, "Indian Yard"),
    ("indian_ft", 0.3047995104977167, "Indian Foot"),
    ("indian_ft_1937", 0.30479841, "Indian Foot 1937"),
    ("indian_ft_1962", 0.3047996, "Indian Foot 1962"),
    ("indian_ft_1975", 0.3047995, "Indian Foot 1975"),
    ("deg", 1.0, "degree"),  # to allow geodesic conversions
]

DISTANCE_UNITS = {abbr: conv for abbr, conv, _ in _DISTANCE_TABLE}

# crs unit fullname -> meters (fullname column of the same table; CRSs
# report the EPSG fullname)
CRS_UNITS = {name: conv for _, conv, name in _DISTANCE_TABLE}
CRS_UNITS["metre_unknown"] = 1.0

# abbr -> seconds (reference unit_utils.py TIME_UNIT_LIST)
TIME_UNITS = {"s": 1.0, "min": 60.0, "h": 3600.0, "d": 86400.0, "a": 31557600.0}


def get_conversion(units=None, crs_units=None) -> UNITS:
    """Resolve a units spec to (d_conv, t_conv, t2_conv, crs_conv) factors.

    Invalid distance/time units raise ValueError; unknown CRS units are
    assumed to be meters (reference warns, we stay silent — engine-level
    policy, warning noise has no place in a distributed plan).
    """
    d_conv, t_conv, t2_conv, crs_conv = 1.0, 1.0, 1.0, 1.0
    if isinstance(units, tuple):
        units = UNITS(*units)
    else:
        units = UNITS(units)

    if units.distance is not None:
        if units.distance not in DISTANCE_UNITS:
            raise ValueError(f"Invalid distance units: {units.distance!r}")
        d_conv = DISTANCE_UNITS[units.distance]
        crs_conv = CRS_UNITS.get(crs_units, 1.0)
        if units.time is not None:
            if units.time not in TIME_UNITS:
                raise ValueError(f"Invalid time units: {units.time!r}")
            t_conv = TIME_UNITS[units.time]
        if units.time2 is not None:
            if units.time2 not in TIME_UNITS:
                raise ValueError(f"Invalid second time units: {units.time2!r}")
            t2_conv = TIME_UNITS[units.time2]
    return UNITS(d_conv, t_conv, t2_conv, crs_conv)
