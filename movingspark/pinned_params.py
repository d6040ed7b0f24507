"""Shared parameters for the pinned-oracle operators.

One source of truth for the query parameters used by BOTH
tools/gen_pinned_oracles.py (single-process expected-output generation)
and __spark_entry__.py (the driver queries) — a drift between the two
would make the oracle test a different computation than the query.
"""

# The sf dir the correctness driver evaluates at. BOTH the pinned-oracle
# generator (tools/gen_pinned_oracles.py) and the generated artifact
# (movingspark/pinned_oracles_sf001.py, whose PINNED_SQL the driver
# contract __spark_entry__.oracle_sql() exports) derive the primary pin
# set from this one constant, so a regeneration with any sf-dir argument
# order can never silently repoint what the driver sees (round-4 lesson:
# a reorder of the generator's default args flipped PINNED_SQL to the
# sf0.001 set and turned 15 driver rows red at sf0.01).
DRIVER_SF = "/root/testdata/sf0.01"

DP_TOLERANCE = 10.0
STOP_MAX_DIAMETER = 50.0
STOP_MIN_DURATION_S = 7200.0

# X8/X9/X10/X12 generalizers
GEN_MIN_DISTANCE_TOL = 10.0
GEN_MIN_TIMEDELTA_S = 7200.0
GEN_MAX_DISTANCE_TOL = 10.0
GEN_TDTR_TOL = 10.0

# X14 outlier cleaner (reference defaults: v_max from q95 * alpha)
OUTLIER_ALPHA = 3.0

# X15 Kalman smoother — restricted to a deterministic trajectory subset
# to keep the pinned expected-output table small
KALMAN_PROCESS_STD = 0.5
KALMAN_MEASUREMENT_STD = 1.0
KALMAN_TRAJ_MOD = 10  # trajs with CAST(traj_id AS INT) % MOD == 0

# X16 significant points / X17 grid clustering
SIG_MAX_DISTANCE = 30.0
SIG_MIN_DISTANCE = 5.0
SIG_MIN_STOP_S = 14400.0
SIG_MIN_ANGLE = 45.0
CLUSTER_MAX_DISTANCE = 15.0

# X6 angle-change splitter
ANGLE_MIN_ANGLE = 45.0
ANGLE_MIN_SPEED = 0.0

# X19 overlay clip polygon (the standard rectangle used by the PIP queries)
OVERLAY_POLY = [(20.0, 80.0), (120.0, 80.0), (120.0, 20.0), (20.0, 20.0)]
# X20 intersection feature properties
OVERLAY_FEATURE_PROPS = {"zone": "aoi-1", "priority": 7}
