from rappas_tpu.build.explorer import explore_node, explore_node_exact  # noqa: F401
from rappas_tpu.build.pipeline import build_database, BuildConfig  # noqa: F401
