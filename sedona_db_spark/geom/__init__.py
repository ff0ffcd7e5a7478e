from sedona_db_spark.geom.core import Geom, from_wkb, to_wkb  # noqa: F401
from sedona_db_spark.geom.wkt import from_wkt, to_wkt  # noqa: F401
