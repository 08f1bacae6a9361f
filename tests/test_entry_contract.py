"""Driver-contract shape checks: entry() smoke + queries/oracle keys."""

import __ray_entry__ as entry_mod


def test_entry_runs_and_has_stable_schema():
    df = entry_mod.entry()
    assert len(df) > 0
    expected = {
        "url", "extracted_text", "keep", "drop_reason", "scrubbed_text",
        "lang_pred", "ppl", "n_kept", "quality_flags",
    }
    assert expected <= set(df.columns)
    assert df["url"].is_unique
    # second call: identical result (deterministic corpus + pipeline)
    df2 = entry_mod.entry()
    assert df["extracted_text"].tolist() == df2["extracted_text"].tolist()


def test_oracle_keys_subset_of_queries():
    q = set(entry_mod.queries())
    o = set(entry_mod.oracle_sql())
    assert o <= q
    assert len(q) >= 25
    for sql in entry_mod.oracle_sql().values():
        assert isinstance(sql, str) and "SELECT" in sql.upper()
