from data_validator_spark.operators.suggest import suggest_constraints


def _by_col(rows):
    out = {}
    for r in rows:
        out.setdefault(r["column_name"], {})[r["constraint"]] = r
    return out


def test_suggest_families(spark):
    df = spark.createDataFrame(
        [
            (1, "a", "RED", 5.0),
            (2, "b", "BLUE", -1.0),
            (3, "c", "RED", 7.5),
            (4, None, "BLUE", 2.0),
        ],
        "id int, name string, color string, bal double",
    )
    got = _by_col(suggest_constraints(df).collect())
    assert set(got["id"]) == {"not_null", "unique", "range", "non_negative"}
    assert (got["id"]["range"]["lo"], got["id"]["range"]["hi"]) == (1.0, 4.0)
    # name: has a null -> no not_null; 3 distinct of 3 non-null -> unique;
    # low-card string -> is_in over the NON-NULL value set
    assert set(got["name"]) == {"unique", "is_in"}
    assert got["name"]["is_in"]["allowed"] == '["a","b","c"]'
    assert set(got["color"]) == {"not_null", "is_in"}
    assert got["color"]["is_in"]["allowed"] == '["BLUE","RED"]'
    # bal: negative min -> range but no non_negative
    assert set(got["bal"]) == {"not_null", "unique", "range"}
    assert got["bal"]["range"]["lo"] == -1.0


def test_suggest_low_card_threshold(spark):
    df = spark.createDataFrame([(str(i % 20),) for i in range(100)], "v string")
    got = _by_col(suggest_constraints(df, low_card_max=12).collect())
    assert "is_in" not in got.get("v", {})
    got_wide = _by_col(suggest_constraints(df, low_card_max=25).collect())
    import json
    assert len(json.loads(got_wide["v"]["is_in"]["allowed"])) == 20


def test_suggest_approx_mode_flags_key_candidate(spark):
    df = spark.createDataFrame([(i,) for i in range(5000)], "id int")
    got = _by_col(suggest_constraints(df, exact=False).collect())
    assert "unique" in got["id"]


def test_candidate_keys_mining(spark):
    from data_validator_spark.operators.suggest import candidate_keys

    df = spark.createDataFrame(
        [
            (1, "a", 1), (2, "a", 2), (3, "b", 1), (4, "b", 2),
        ],
        "id int, grp string, seq int",
    )
    got = {r["key"]: r for r in candidate_keys(df, ["id", "grp", "seq"]).collect()}
    assert got["id"]["is_key"] and got["id"]["is_minimal"]
    assert not got["grp"]["is_key"] and not got["seq"]["is_key"]
    assert got["grp,seq"]["is_key"] and got["grp,seq"]["is_minimal"]
    # supersets of the single-column key are keys but not minimal
    assert got["id,grp"]["is_key"] and not got["id,grp"]["is_minimal"]


def test_candidate_keys_null_members_excluded(spark):
    from data_validator_spark.operators.suggest import candidate_keys

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, None)], "id int, g string"
    )
    got = {r["key"]: r for r in candidate_keys(df, ["id", "g"]).collect()}
    assert got["g"]["n_rows"] == 1  # null member rows can't identify
    assert got["id,g"]["n_rows"] == 1 and got["id,g"]["is_key"]


def test_format_profile(spark):
    from data_validator_spark.operators.suggest import format_profile

    df = spark.createDataFrame(
        [
            ("2024-01-01", "en", "a@b.com"),
            ("2024-02-30", "pt-BR", "nope"),
            (None, "de", "x@y.org"),
        ],
        "d string, lang string, mail string",
    )
    got = {
        (r["column_name"], r["format"]): r
        for r in format_profile(df, ["d", "lang", "mail"]).collect()
    }
    assert got[("d", "iso_date")]["n_match"] == 2
    assert got[("d", "iso_date")]["match_rate"] == 1.0  # of 2 non-null
    assert got[("d", "iso_date")]["suggest"]
    assert got[("lang", "bcp47_lang")]["n_match"] == 3
    assert got[("mail", "email")]["n_match"] == 2
    assert not got[("mail", "email")]["suggest"]  # 2/3 < 0.95
    # columns matching nothing emit nothing
    assert not any(k[0] == "d" and k[1] == "email" for k in got)


def test_audit_report_sections(spark):
    from data_validator_spark.operators.audit import audit_report

    df = spark.createDataFrame(
        [(1, "RED", 10.5), (2, "BLUE", None), (3, "RED", 30.0), (4, None, 44.0)],
        "id int, color string, amount double",
    )
    rows = audit_report(df, ["id", "amount"], ["color"]).collect()
    by = {(r["section"], r["column_name"], r["metric"]): r for r in rows}
    assert by[("completeness", "amount", "null_rate")]["value_num"] == 0.25
    assert by[("cardinality", "id", "distinct_ratio")]["value_num"] == 1.0
    assert by[("range", "amount", "max")]["value_num"] == 44.0
    assert by[("entropy", "color", "entropy_bits")]["value_num"] == 1.5
    assert by[("constraints", "color", "is_in")]["value_str"] == '["BLUE","RED"]'
    assert by[("constraints", "amount", "range")]["value_str"] == "hi=44.0"
    assert ("benford", "id", "mad") in by
