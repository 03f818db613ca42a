"""Grammar front-end tests.

Mirrors the reference's test strategy (test/grammar/test_generate.py:
13-234): build a grammar with the dialect combinators, generate valid
samples, and check them against an external acceptor (json.loads for
the JSON grammar).  Our dual adds the validator direction: the
compiled grammar must accept exactly the strings the acceptor accepts.
"""

import json

import pytest

from fences_spark.schema.grammar import (
    Alternative,
    CharacterRange,
    CompiledGrammar,
    GrammarError,
    NonTerminal,
    Repetition,
    Terminal,
    earley_accepts,
    generate_samples,
    regex_of,
    to_productions,
)


def _nt(*names):
    return [NonTerminal(n) for n in names]


# ---------------------------------------------------------------------------
# regex tier (acyclic)
# ---------------------------------------------------------------------------

def test_terminal_concat_alt_regex():
    a, b = _nt("a", "b")
    g = {
        "start": Terminal("x") + a | b,
        a: Terminal("yy"),
        b: [Terminal("z"), Terminal("w")],
    }
    cg = CompiledGrammar(g, "start")
    assert not cg.is_recursive
    assert cg.accepts("xyy")
    assert cg.accepts("z") and cg.accepts("w")
    assert not cg.accepts("x") and not cg.accepts("zz") and not cg.accepts("")


def test_repetition_bounds_regex():
    g = {"start": Terminal("ab") * (2, 4)}
    cg = CompiledGrammar(g, "start")
    assert not cg.is_recursive
    for n, ok in [(0, False), (1, False), (2, True), (3, True), (4, True), (5, False)]:
        assert cg.accepts("ab" * n) is ok


def test_repetition_unbounded_true_semantics():
    # reference generation caps {m,} at m+3 (convert.py:108-115);
    # validation must keep the true unbounded language
    g = {"start": Terminal("a") * (1, None)}
    cg = CompiledGrammar(g, "start")
    assert cg.accepts("a" * 50)
    assert not cg.accepts("")


def test_character_range_and_open_ends():
    g = {"start": CharacterRange("a", "f") + CharacterRange("0", "9")}
    cg = CompiledGrammar(g, "start")
    assert cg.accepts("c7") and not cg.accepts("g7") and not cg.accepts("c")
    g2 = {"start": CharacterRange(" ", None)}  # open upper end
    cg2 = CompiledGrammar(g2, "start")
    assert cg2.accepts("Z") and cg2.accepts("~") and not cg2.accepts("\x1f")


def test_regex_metachar_escaping():
    g = {"start": Terminal("a.b") | Terminal("c[d]")}
    cg = CompiledGrammar(g, "start")
    assert cg.accepts("a.b") and cg.accepts("c[d]")
    assert not cg.accepts("axb")


def test_nested_alternative_inside_concat():
    inner = Alternative([Terminal("x"), Terminal("y")])
    g = {"start": Terminal("<") + inner + Terminal(">")}
    cg = CompiledGrammar(g, "start")
    assert cg.accepts("<x>") and cg.accepts("<y>") and not cg.accepts("<z>")


def test_regex_of_rejects_recursion():
    s = NonTerminal("s")
    with pytest.raises(GrammarError):
        regex_of({s: Terminal("a") + s | Terminal("b")}, s)


def test_undefined_nonterminal_raises():
    with pytest.raises(GrammarError):
        to_productions({"start": NonTerminal("nope")}, "start")


# ---------------------------------------------------------------------------
# Earley tier (recursive)
# ---------------------------------------------------------------------------

def balanced_parens():
    s = NonTerminal("s")
    return {s: [Terminal(""), Terminal("(") + s + Terminal(")") + s]}, s


def test_earley_balanced_parens():
    g, s = balanced_parens()
    cg = CompiledGrammar(g, s)
    assert cg.is_recursive
    for ok in ["", "()", "(())()", "((()))"]:
        assert cg.accepts(ok), ok
    for bad in ["(", ")", "())", "(()", ")("]:
        assert not cg.accepts(bad), bad


def test_earley_ambiguous_grammar():
    # E -> E '+' E | 'n'  (ambiguous)
    e = NonTerminal("e")
    cg = CompiledGrammar({e: [e + Terminal("+") + e, Terminal("n")]}, e)
    assert cg.accepts("n+n+n") and cg.accepts("n")
    assert not cg.accepts("n+") and not cg.accepts("+n")


def json_grammar():
    """RFC 8259 JSON grammar in the dialect — the reference's own
    flagship grammar test (test/grammar/test_generate.py:30-147), with
    the character rule completed (reference leaves a TODO excluding
    '"' and '\\'; we exclude them so the language is exact)."""
    (start, element, value, obj, array, string, number, ws, member,
     members, elements, characters, character, escape, hexn, integer,
     fraction, exponent, digits, digit, one_nine, sign) = _nt(
        "json", "element", "value", "object", "array", "string",
        "number", "ws", "member", "members", "elements", "characters",
        "character", "escape", "hex", "integer", "fraction",
        "exponent", "digits", "digit", "one_nine", "sign")
    g = {
        start: [element],
        value: [obj, array, string, number, Terminal("true"),
                Terminal("false"), Terminal("null")],
        obj: [Terminal("{") + ws + Terminal("}"),
              Terminal("{") + members + Terminal("}")],
        members: [member, member + Terminal(",") + members],
        member: [ws + string + ws + Terminal(":") + element],
        array: [Terminal("[") + ws + Terminal("]"),
                Terminal("[") + elements + Terminal("]")],
        elements: [element, element + Terminal(",") + elements],
        element: [ws + value + ws],
        string: [Terminal('"') + characters + Terminal('"')],
        characters: [Terminal(""), character + characters],
        character: [CharacterRange(" ", "!"),        # 0x20-0x21 (skip ")
                    CharacterRange("#", "["),        # 0x23-0x5B (skip \)
                    CharacterRange("]", None),       # 0x5D-...
                    Terminal("\\") + escape],
        escape: [Terminal(c) for c in '"\\/bfnrt'] +
                [Terminal("u") + hexn + hexn + hexn + hexn],
        hexn: [digit, CharacterRange("A", "F"), CharacterRange("a", "f")],
        number: [integer + fraction + exponent],
        integer: [digit, one_nine + digits, Terminal("-") + digit,
                  Terminal("-") + one_nine + digits],
        digits: [digit, digit + digits],
        digit: [Terminal("0"), one_nine],
        one_nine: [CharacterRange("1", "9")],
        fraction: [Terminal(""), Terminal(".") + digits],
        exponent: [Terminal(""),
                   Terminal("E") + sign + digits,
                   Terminal("e") + sign + digits],
        sign: [Terminal(""), Terminal("+"), Terminal("-")],
        ws: [Terminal(""), Terminal(" ") + ws, Terminal("\n") + ws,
             Terminal("\r") + ws, Terminal("\t") + ws],
    }
    return g, start


JSON_CASES_VALID = [
    "{}", "[]", '""', "0", "-0", "123", "-1.5", "1e9", "1E+2", "0.25e-3",
    'true', 'false', 'null', '{"a":1}', '[1,2,3]', '{"a":[{"b":null}]}',
    ' { "k" : [ true , "\\u00e9" ] } ', '"\\n\\t\\\\"', '[[[[]]]]',
]
JSON_CASES_INVALID = [
    "", "{", "[1,]", "{\"a\":}", "01", "+1", "1.", ".5", "'a'", "tru",
    "[1 2]", '{"a" 1}', '"\\x"', '"unterminated', "nan", "--1", "1e",
    '{"a":1,}',
]


def test_json_grammar_vs_python_oracle():
    g, start = json_grammar()
    cg = CompiledGrammar(g, start)
    assert cg.is_recursive
    for s in JSON_CASES_VALID:
        json.loads(s)  # sanity: the oracle accepts
        assert cg.accepts(s), f"should accept {s!r}"
    for s in JSON_CASES_INVALID:
        with pytest.raises(Exception):
            json.loads(s)
        assert not cg.accepts(s), f"should reject {s!r}"


def test_generated_samples_accepted_by_json_loads():
    g, start = json_grammar()
    cg = CompiledGrammar(g, start)
    samples = generate_samples(g, start)
    assert len(samples) >= 20
    for s in samples:
        json.loads(s)           # external acceptor (reference pattern)
        assert cg.accepts(s)    # self-consistency


def test_generated_samples_regular_grammar():
    g = {"start": Terminal("ab") * (2, 4) + (Terminal("x") | Terminal("y"))}
    samples = generate_samples(g, "start")
    cg = CompiledGrammar(g, "start")
    assert samples and all(cg.accepts(s) for s in samples)
    # alternative coverage: both x and y suffixes appear
    assert any(s.endswith("x") for s in samples)
    assert any(s.endswith("y") for s in samples)


# ---------------------------------------------------------------------------
# Spark integration
# ---------------------------------------------------------------------------

def test_column_regex_tier(spark):
    g = {"start": CharacterRange("a", "z") * (2, 2)}  # exactly 'lang' shape
    cg = CompiledGrammar(g, "start")
    df = spark.createDataFrame(
        [("en",), ("zzz",), ("E1",), (None,), ("de",)], ["v"])
    got = [r.ok for r in df.select(cg.column(df.v).alias("ok")).collect()]
    assert got == [True, False, False, False, True]


def test_column_earley_tier(spark):
    g, s = balanced_parens()
    cg = CompiledGrammar(g, s)
    df = spark.createDataFrame(
        [("()",), ("(()",), ("",), (None,), ("(())()",)], ["v"])
    got = [r.ok for r in df.select(cg.column(df.v).alias("ok")).collect()]
    assert got == [True, False, True, False, True]


def test_duckdb_oracle_agreement():
    """The sql_full_match predicate agrees with Spark-side semantics
    (same regex, RE2 vs Java) on boundary strings."""
    import duckdb
    g = {"start": (CharacterRange("0", "9") * (1, 3)) + Terminal("-") +
                  (Terminal("HIGH") | Terminal("LOW"))}
    cg = CompiledGrammar(g, "start")
    cases = ["5-LOW", "123-HIGH", "1234-LOW", "-HIGH", "5-low", "5-LOW\n"]
    expected = [cg.accepts(c) for c in cases]
    con = duckdb.connect()
    got = [con.sql("select " + cg.sql_full_match("?v") .replace("?v", f"'{c}'")).fetchone()[0]
           for c in cases]
    assert got == expected


# ---------------------------------------------------------------------------
# review-pass regressions
# ---------------------------------------------------------------------------

def test_unbounded_repetition_stays_regex_tier():
    # `a{1,}` is regular; the desugared self-recursive tail production
    # must not cost it the JVM tier (review finding)
    from fences_spark.schema.grammar import Terminal
    cg = CompiledGrammar({"start": Terminal("a") * (1, None)}, "start")
    assert not cg.is_recursive
    assert cg.regex is not None
    assert cg.accepts("a" * 100) and not cg.accepts("")
    # oracle SQL available for unbounded grammars too
    assert "regexp_matches" in cg.sql_full_match("x")


def test_astral_plane_characters_accepted():
    # CharacterRange(' ', None) must reach U+10FFFF (reference's
    # 0x10FFF constant is a typo that rejects emoji)
    g = {"start": CharacterRange(" ", None)}
    cg = CompiledGrammar(g, "start")
    assert cg.accepts("\U0001F600")
    g2, start = json_grammar()
    cg2 = CompiledGrammar(g2, start)
    s = '"\U0001F600"'
    json.loads(s)
    assert cg2.accepts(s)


def test_control_char_class_portable():
    # \xNN escapes must parse in Python re (driver-side accepts),
    # Java (rlike) and RE2 (DuckDB oracle)
    g = {"start": CharacterRange("\x00", "\x1f")}
    cg = CompiledGrammar(g, "start")
    assert cg.accepts("\x05")
    assert not cg.accepts("A")
    import duckdb
    got = duckdb.sql(
        "select " + cg.sql_full_match("chr(5)")).fetchone()[0]
    assert got is True
