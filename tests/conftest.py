import pytest

from accelerated_intelligent_document_processing_on_aws_spark import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="idp-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def spark_session_for_fuzz(spark):
    """Alias of the shared session for hypothesis fuzz tests (get_spark
    is getOrCreate-backed, so a second 'session' would just return —
    or worse, pre-empt — the shared one; a per-example session would
    dominate the fuzz wall time)."""
    return spark
