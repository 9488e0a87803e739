from rappas_tpu.place.engine import PlacementEngine  # noqa: F401
from rappas_tpu.place.pipeline import place_queries, PlacementConfig  # noqa: F401
