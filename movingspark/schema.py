"""Canonical schemas and column-name constants.

Mirrors the reference's derived-column name registry
(reference trajectory.py:43-49) and the north-rule interleaved
document schema (BASELINE.json:15 / FIXTURES.md §3).
"""

from dataclasses import dataclass

from pyspark.sql import types as T

# Derived-column names (reference trajectory.py:43-49)
ACCELERATION = "acceleration"
ANGULAR_DIFFERENCE = "angular_difference"
DIRECTION = "direction"
DISTANCE = "distance"
SPEED = "speed"
TIMEDELTA = "timedelta_s"  # seconds as double (reference uses timedelta64)
TRAJ_ID = "traj_id"
OBJ_ID = "obj_id"

# Earth constants (reference geometry_utils.py:18-19)
R_EARTH = 6371000.0  # spherical radius, meters
C_EARTH = 40075016.6856  # equatorial circumference, meters

# WGS84 ellipsoid (public constants; used by the geodesic kernel)
WGS84_A = 6378137.0
WGS84_F = 1.0 / 298.257223563


@dataclass(frozen=True)
class PointCols:
    """Column-name binding for a trajectory point DataFrame."""

    traj_id: str = "traj_id"
    t: str = "t"
    x: str = "x"
    y: str = "y"
    obj_id: str = "obj_id"


TRAJ_COLS = PointCols()

# Canonical point schema (SURVEY.md §1.2)
POINT_SCHEMA = T.StructType(
    [
        T.StructField("traj_id", T.StringType(), False),
        T.StructField("obj_id", T.StringType(), True),
        T.StructField("t", T.TimestampType(), False),
        T.StructField("x", T.DoubleType(), False),
        T.StructField("y", T.DoubleType(), False),
    ]
)

# North-rule interleaved document schema (BASELINE.json:15)
SPAN_SCHEMA = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("media_ref", T.StringType(), True),
        T.StructField("offset", T.IntegerType(), False),
    ]
)

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("spans", T.ArrayType(SPAN_SCHEMA), False),
    ]
)
