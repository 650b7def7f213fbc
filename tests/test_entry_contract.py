"""Driver-contract guards: the queries()/oracle_sql() registries stay
consistent (every oracle key has a query, names are unique and stable,
SQL strings reference registered tables only)."""

import re

import __ray_entry__ as entry


def test_oracle_keys_subset_of_queries():
    qs, osql = entry.queries(), entry.oracle_sql()
    missing = [k for k in osql if k not in qs]
    assert not missing, f"oracle SQL without query impl: {missing}"
    assert len(qs) >= 40
    assert len(osql) >= 25


def test_all_queries_callable():
    qs = entry.queries()
    for name, fn in qs.items():
        assert callable(fn), name


TABLES = set(
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def test_oracle_sql_references_known_tables():
    osql = entry.oracle_sql()
    for name, sql in osql.items():
        # CTE names, with or without an explicit column list:
        # `name AS (` and `name(col, ...) AS (`
        ctes = {
            m.lower()
            for m in re.findall(r"(\w+)\s*(?:\([^)]*\))?\s+AS\s*\(", sql)
        }
        froms = set(
            t.lower()
            for t in re.findall(
                r"(?:\bFROM\b|\bJOIN\b)\s+([A-Za-z_][A-Za-z0-9_]*)", sql
            )
        )
        # EXTRACT(x FROM col) false-positives: drop anything that is a CTE
        # alias or appears only inside an EXTRACT(...)
        extracts = {
            m.lower() for m in re.findall(r"EXTRACT\s*\(\s*\w+\s+FROM\s+(\w+)", sql)
        }
        # table functions are valid FROM targets, not tables
        table_fns = {"unnest", "generate_series", "range", "values"}
        unknown = froms - TABLES - ctes - extracts - table_fns
        assert not unknown, f"{name}: unknown tables {unknown}"
