from fences_spark.schema.regex_dialect import compile_dialect_pattern


def test_plain_passthrough():
    assert compile_dialect_pattern(r"^[a-f0-9]{40}$") == [(r"^[a-f0-9]{40}$", False)]


def test_conjunction():
    out = compile_dialect_pattern(r"(^a.*)&(.*b$)")
    assert out == [("^a.*", False), (".*b$", False)]


def test_negation():
    assert compile_dialect_pattern(r"!(^x)") == [("^x", True)]


def test_conjunction_with_negation():
    out = compile_dialect_pattern(r"(^a)&(!(b$))")
    assert out == [("^a", False), ("b$", True)]


def test_amp_inside_class_not_split():
    out = compile_dialect_pattern(r"[&]x")
    assert out == [("[&]x", False)]


def test_escaped_amp_not_split():
    out = compile_dialect_pattern(r"a\&b")
    assert out == [(r"a\&b", False)]


def test_alternation_wrapper_strip_is_safe():
    # stripping a full (a|b) wrapper keeps search semantics
    out = compile_dialect_pattern(r"(cat|dog)")
    assert out == [("cat|dog", False)]


def test_group_not_fully_wrapping_kept():
    out = compile_dialect_pattern(r"(a)(b)")
    assert out == [("(a)(b)", False)]
