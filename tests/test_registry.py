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
    # Within each priority tier, SQL-backed entries must sort before
    # rows-only ones (a hash-green row is stronger evidence).  The previous
    # form of this assertion ("window[:50] is all-SQL") only holds while
    # >=50 unchecked SQL entries remain, which stops being true as soon as
    # the driver has recorded enough rounds — so assert the invariant the
    # ordering function actually guarantees instead.
    import glob
    import json
    import os

    here = os.path.dirname(os.path.abspath(E.__file__))
    seen, green = set(), set()
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        try:
            rows = json.load(open(path))
        except Exception:
            continue
        for name, rec in rows.items():
            seen.add(name)
            if rec.get("rows_match") and rec.get("schema_match") and rec.get("hash_match"):
                green.add(name)

    def tier(n):
        if n in seen and n not in green and n in ORACLE:
            return 0
        if n not in seen:
            return 1
        return 3 if n in green else 2

    keys = [(tier(n), 0 if n in ORACLE else 1) for n in order]
    assert keys == sorted(keys), "priority order must be non-decreasing by (tier, sql-first)"
