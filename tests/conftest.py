import pytest

from feature_extraction_spark.session import get_spark
from feature_extraction_spark.synth import synth_transcripts


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cores=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def transcripts(spark):
    """Small deterministic transcripts table, cached for the test session."""
    df = synth_transcripts(spark, n_convs=60, seed=42, max_turns=300).cache()
    df.count()
    return df


@pytest.fixture(scope="session")
def transcripts_pd(transcripts):
    return transcripts.toPandas()
