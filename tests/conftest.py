import pytest

from accelerated_intelligent_document_processing_on_aws_spark import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="idp-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()
