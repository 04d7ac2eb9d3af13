"""Every queries() entry with an oracle must match DuckDB at sf0.001 —
the local mirror of the driver's CORRECTNESS gate (exact values, including
bit-exact floats: money is integer cents, coordinates share IEEE op order)."""

import pytest

from tests.oracle_util import compare, duck_con

SF_DIR = "/root/testdata/sf0.001"


def _cases():
    from whitebox_tools_ray.pipelines.queries import ORACLE, QUERIES

    return sorted(ORACLE.keys()), QUERIES, ORACLE


@pytest.fixture(scope="module")
def con():
    c = duck_con(SF_DIR)
    yield c
    c.close()


def pytest_generate_tests(metafunc):
    if "qname" in metafunc.fixturenames:
        names, _, _ = _cases()
        metafunc.parametrize("qname", names)


def test_query_matches_oracle(qname, con, ray_session):
    _, queries, oracle = _cases()
    result = queries[qname](SF_DIR)
    expected = con.execute(oracle[qname]).fetchdf()
    compare(result, expected, qname)
