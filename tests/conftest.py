import pytest

from accelerated_intelligent_document_processing_on_aws_spark import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="idp-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def spark_session_for_fuzz(request):
    """Session-scoped Spark for hypothesis fuzz tests (a per-example
    session would dominate the fuzz wall time)."""
    s = get_spark(
        app_name="idp-fuzz", master="local[2]", shuffle_partitions=2
    )
    request.addfinalizer(s.stop)
    return s
