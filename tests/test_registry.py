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


def test_queries_are_callable():
    for name, fn in eq.QUERIES.items():
        assert callable(fn), name


def test_no_duplicate_keys_in_registry_literals():
    """A repeated key in a dict LITERAL silently keeps the last binding, so
    the runtime dict can't reveal it — scan the source AST instead."""
    import ast
    import inspect

    tree = ast.parse(inspect.getsource(eq))
    for target_name in ("QUERIES", "ORACLES"):
        for node in ast.walk(tree):
            if (
                isinstance(node, ast.AnnAssign)
                and isinstance(node.target, ast.Name)
                and node.target.id == target_name
            ) or (
                isinstance(node, ast.Assign)
                and any(
                    isinstance(t, ast.Name) and t.id == target_name
                    for t in node.targets
                )
            ):
                keys = [
                    k.value
                    for k in node.value.keys
                    if isinstance(k, ast.Constant)
                ]
                dupes = {k for k in keys if keys.count(k) > 1}
                assert not dupes, f"duplicate keys in {target_name}: {dupes}"
                assert len(keys) == len(getattr(eq, target_name))
