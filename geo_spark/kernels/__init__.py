"""Pure-numpy geometry kernels — no Spark imports allowed here.

Each kernel is vectorized over numpy arrays so that a pandas UDF can apply it
to a whole Arrow batch at once. Parity targets are the reference's own unit
tests and doctest goldens (see SURVEY.md §5 / FIXTURES.md §4); each module
cites the reference file:line whose *behavior* it reproduces.
"""

from geo_spark.kernels.predicates import (  # noqa: F401
    orient2d,
    ring_position,
    polygon_position,
    INSIDE,
    ON_BOUNDARY,
    OUTSIDE,
)
from geo_spark.kernels.measures import (  # noqa: F401
    haversine_distance,
    haversine_bearing,
    haversine_destination,
    rhumb_distance,
    vincenty_distance,
    euclidean_distance,
    cross_track_distance,
    MEAN_EARTH_RADIUS,
)
from geo_spark.kernels.hull import quick_hull, trivial_hull  # noqa: F401
from geo_spark.kernels.area import (  # noqa: F401
    ring_signed_area,
    polygon_signed_area,
    polygon_unsigned_area,
    ring_is_ccw,
    ring_centroid,
    polygon_centroid,
    bounding_rect,
)
from geo_spark.kernels.clip import clip_ring_to_rect, rect_clip_area  # noqa: F401
