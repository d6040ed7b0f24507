"""Unit conversion system.

Same semantics as the reference (unit_utils.py:208-254): a units spec is
``units=(distance, time, time2)`` (or a bare distance string); conversion
resolves to four scalar factors applied as

    dist_in_units   = raw_dist * crs_conv / d_conv
    speed_in_units  = dist_in_units / dt_seconds * t_conv
    accel_in_units  = d(speed) / dt_seconds * t2_conv

Factors become literal columns at plan-build time (constant folding —
no runtime lookup). Covers the reference's international unit set
(unit_utils.py:12-198); exotic survey feet omitted, add on demand.
"""

from collections import namedtuple

UNITS = namedtuple("UNITS", "distance time time2 crs", defaults=(None,) * 4)

# abbr -> meters (reference unit_utils.py DISTANCE_UNIT_LIST, public factors)
DISTANCE_UNITS = {
    "km": 1000.0,
    "m": 1.0,
    "dm": 0.1,
    "cm": 0.01,
    "mm": 0.001,
    "nm": 1852.0,
    "inch": 0.0254,
    "ft": 0.3048,
    "yd": 0.9144,
    "mi": 1609.344,
    "link": 0.201168,
    "chain": 20.1168,
    "fathom": 1.8288,
    "rod": 0.1988387815,
    "furlong": 201.168,
}

# crs unit fullname -> meters (subset: metric CRSs report 'metre')
CRS_UNITS = {"metre": 1.0, "Kilometer": 1000.0, "metre_unknown": 1.0}

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
