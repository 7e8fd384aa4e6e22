"""Driver-contract registry invariants (no Ray session needed).

The per-round driver runs `queries()` in dict order and caps the
CORRECTNESS run at 50 rows, so every SQL-oracled query must sit in the
first 50 registry slots — otherwise a provably-checkable pipeline
silently loses its driver row (round-2 lesson).
"""

from geojson_vt_ray.ray_pipeline import entry_queries as eq

DRIVER_CAP = 50


def test_every_oracle_key_is_a_query():
    missing = set(eq.ORACLES) - set(eq.QUERIES)
    assert not missing, f"oracles without queries: {missing}"


def test_oracled_queries_form_a_prefix_within_the_driver_cap():
    keys = list(eq.QUERIES)
    oracled = [k for k in keys if k in eq.ORACLES]
    # all oracled entries fit under the cap ...
    assert len(oracled) <= DRIVER_CAP, (
        f"{len(oracled)} oracled queries exceed the driver's {DRIVER_CAP}-row "
        "cap — some would never get a CORRECTNESS row"
    )
    # ... and come first, as one contiguous block
    assert keys[: len(oracled)] == oracled, (
        "registry must list every SQL-oracled query before the first "
        "pytest-oracled one (driver cap drops the tail)"
    )


def test_queries_are_callable_and_named_uniquely():
    assert len(eq.QUERIES) == len(set(eq.QUERIES))
    for name, fn in eq.QUERIES.items():
        assert callable(fn), name
