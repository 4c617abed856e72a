import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pipeline_etl_website_visits_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    import tempfile

    s = get_spark(
        "tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            # static conf: catalog tables (bucketing tests) land in a tmp dir
            "spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="spark-wh-"),
        },
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s


SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(params=["local", "objectstore"])
def any_commit_backend(request):
    """Run a golden under BOTH commit strategies: the default POSIX
    backend and the object-store-semantics one (conditional PUT, plain
    PUT, no rename, no directories). Passing under both proves the
    lease/pointer/ledger protocol never leans on a POSIX-ism the
    documented S3/GCS mapping lacks (VERDICT r8 item 2). Yields the
    active backend so tests can make backend-specific assertions."""
    from pipeline_etl_website_visits_spark.operators import ledger

    if request.param == "local":
        yield ledger.commit_backend()
        return
    prev = ledger.set_commit_backend(ledger.InMemoryObjectStoreBackend())
    try:
        yield ledger.commit_backend()
    finally:
        ledger.set_commit_backend(prev)
