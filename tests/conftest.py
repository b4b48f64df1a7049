import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")  # small & fast for unit tests


@pytest.fixture(scope="session")
def spark():
    from apt_bron_re_spark.session import get_spark
    s = get_spark("tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def layer_map():
    from apt_bron_re_spark.catalog.synthetic import build_layer_map
    return build_layer_map()


@pytest.fixture(scope="session")
def compiled_catalog(layer_map):
    from apt_bron_re_spark.catalog.build import compile_catalog
    return compile_catalog(layer_map)
