from __future__ import annotations

import pytest

from rlerrorgenerator_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="rlerrorgenerator-tests", cores=8, shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def pages_small(spark):
    from rlerrorgenerator_spark.sources.pages import prep_pages, synth_pages

    return prep_pages(synth_pages(spark, 300, seed=42)).localCheckpoint(eager=True)
