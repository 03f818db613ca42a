"""OpenAPI front-end tests — validator dual of the reference's
request generator (fences/open_api/generate.py:198-225): the rows a
valid-sample generator would emit must validate True; boundary
mutations (missing required param, out-of-range value, wrong-type
path id, malformed body) must validate False with the exact failing
check named.
"""

import pytest

from fences_spark.schema.open_api import (
    OpenApiError,
    OpenApiValidator,
    parse_spec,
)

SPEC = {
    "info": {"title": "orders", "version": "1"},
    "components": {
        "schemas": {
            "Priority": {
                "type": "string",
                "enum": ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"],
            },
            "NewOrder": {
                "type": "object",
                "required": ["custkey", "total"],
                "properties": {
                    "custkey": {"type": "integer", "minimum": 1},
                    "total": {"type": "number", "exclusiveMinimum": 0},
                },
            },
        }
    },
    "paths": {
        "/orders/{id}": {
            "get": {
                "operationId": "getOrder",
                "parameters": [
                    {"name": "id", "in": "path",
                     "schema": {"type": "integer", "minimum": 1}},
                    {"name": "priority", "in": "query", "required": False,
                     "schema": {"$ref": "#/components/schemas/Priority"}},
                    {"name": "limit", "in": "query", "required": True,
                     "schema": {"type": "integer", "minimum": 1, "maximum": 100}},
                ],
                "responses": {"200": {"description": "ok"}},
            }
        },
        "/orders": {
            "post": {
                "operationId": "createOrder",
                "requestBody": {
                    "required": True,
                    "content": {"application/json": {
                        "schema": {"$ref": "#/components/schemas/NewOrder"}}},
                },
                "responses": {"201": {"description": "created"}},
            }
        },
    },
}


def test_parse_spec_model():
    ops = parse_spec(SPEC)
    assert set(ops) == {"getOrder", "createOrder"}
    get = ops["getOrder"]
    assert get.method == "GET"
    pid = next(p for p in get.parameters if p.position == "path")
    assert pid.required  # path params implicitly required
    pri = next(p for p in get.parameters if p.name == "priority")
    assert pri.schema.get("enum")  # $ref inlined
    rx, names = get.path_regex()
    assert names == ["id"]
    body = ops["createOrder"].request_body
    assert body.required and body.schema["required"] == ["custkey", "total"]


def test_parse_spec_errors():
    with pytest.raises(OpenApiError):
        parse_spec({"paths": {}})
    bad = {"paths": {"/x": {"get": {
        "operationId": "x",
        "parameters": [{"name": "q", "in": "query", "schema":
                        {"$ref": "#/components/schemas/Nope"}}]}}}}
    with pytest.raises(OpenApiError):
        parse_spec(bad)


@pytest.fixture(scope="module")
def validated(spark):
    rows = [
        # (tag, method, path, query, body)
        ("ok_get",        "GET",  "/orders/7",   {"limit": "10", "priority": "5-LOW"}, None),
        ("ok_get_noprio", "GET",  "/orders/123", {"limit": "100"}, None),
        ("bad_id",        "GET",  "/orders/abc", {"limit": "10"}, None),
        ("bad_id_zero",   "GET",  "/orders/0",   {"limit": "10"}, None),
        ("missing_limit", "GET",  "/orders/7",   {}, None),
        ("big_limit",     "GET",  "/orders/7",   {"limit": "101"}, None),
        ("bad_prio",      "GET",  "/orders/7",   {"limit": "1", "priority": "6-NONE"}, None),
        ("ok_post",       "POST", "/orders",     {}, '{"custkey": 5, "total": 1.5}'),
        ("bad_post_neg",  "POST", "/orders",     {}, '{"custkey": 5, "total": 0}'),
        ("bad_post_miss", "POST", "/orders",     {}, '{"custkey": 5}'),
        ("bad_post_json", "POST", "/orders",     {}, '{"custkey": '),
        ("no_body",       "POST", "/orders",     {}, None),
        ("no_route",      "GET",  "/nope",       {}, None),
    ]
    df = spark.createDataFrame(rows, "tag string, method string, path string, "
                                     "query map<string,string>, body string")
    v = OpenApiValidator(SPEC)
    out = v.validate(df).collect()
    return {r.tag: r for r in out}


def test_routing(validated):
    assert validated["ok_get"].operation_id == "getOrder"
    assert validated["ok_post"].operation_id == "createOrder"
    assert validated["no_route"].operation_id is None
    assert validated["no_route"].failed_checks == ["__no_route__"]


def test_valid_rows(validated):
    for tag in ("ok_get", "ok_get_noprio", "ok_post"):
        assert validated[tag].row_valid, tag
        assert validated[tag].failed_checks == []


@pytest.mark.parametrize("tag,check", [
    ("bad_id", "path.id"),
    ("bad_id_zero", "path.id"),
    ("missing_limit", "query.limit"),
    ("big_limit", "query.limit"),
    ("bad_prio", "query.priority"),
    ("bad_post_neg", "body"),
    ("bad_post_miss", "body"),
    ("bad_post_json", "body"),
    ("no_body", "body"),
])
def test_invalid_rows_name_the_check(validated, tag, check):
    assert not validated[tag].row_valid, tag
    assert check in validated[tag].failed_checks, tag


def test_verdicts_aggregate(spark, validated):
    # verdicts over the same small table: pure groupBy, no extra pass logic
    rows = [(r.operation_id, r.row_valid) for r in validated.values()]
    df = spark.createDataFrame(rows, "operation_id string, row_valid boolean")
    v = OpenApiValidator(SPEC)
    got = {r.operation_id: (r.n_valid, r.n_invalid)
           for r in v.verdicts(df).collect()}
    assert got["getOrder"] == (2, 5)
    assert got["createOrder"] == (1, 4)
    assert got[None] == (0, 1)


# ---------------------------------------------------------------------------
# review-pass regressions
# ---------------------------------------------------------------------------

def test_path_level_fields_and_shared_parameters():
    spec = {
        "paths": {
            "/things/{id}": {
                "summary": "path-level summary is not a method",
                "description": "neither is this",
                "parameters": [
                    {"name": "id", "in": "path",
                     "schema": {"type": "integer", "minimum": 1}},
                ],
                "get": {"operationId": "getThing", "responses": {}},
                "delete": {
                    "operationId": "delThing",
                    "parameters": [
                        {"name": "id", "in": "path",  # overrides shared
                         "schema": {"type": "integer", "minimum": 100}},
                    ],
                    "responses": {},
                },
            }
        }
    }
    ops = parse_spec(spec)
    assert set(ops) == {"getThing", "delThing"}
    get_id = next(p for p in ops["getThing"].parameters if p.name == "id")
    assert get_id.schema["minimum"] == 1          # inherited from path level
    del_id = next(p for p in ops["delThing"].parameters if p.name == "id")
    assert del_id.schema["minimum"] == 100        # operation override wins


def test_boolean_component_schema_ref():
    spec = {
        "components": {"schemas": {"Any": True}},
        "paths": {"/x": {"get": {
            "operationId": "x",
            "parameters": [{"name": "q", "in": "query",
                            "schema": {"$ref": "#/components/schemas/Any"}}],
            "responses": {}}}},
    }
    ops = parse_spec(spec)
    assert ops["x"].parameters[0].schema is True


# ---------------------------------------------------------------------------
# response validation (the reference's Response model dual,
# fences/open_api/open_api.py:33-211)
# ---------------------------------------------------------------------------

RESP_SPEC = {
    "info": {"title": "t", "version": "1"},
    "components": {"schemas": {
        "Out": {"type": "object", "required": ["id"],
                "properties": {"id": {"type": "integer", "minimum": 1}}},
    }},
    "paths": {
        "/things/{id}": {"get": {
            "operationId": "getThing",
            "responses": {
                "200": {"description": "ok", "content": {"application/json": {
                    "schema": {"$ref": "#/components/schemas/Out"}}}},
                "2XX": {"description": "other success"},  # 200 must win
                "4XX": {"description": "client error"},
            }}},
        "/things": {"post": {
            "operationId": "makeThing",
            "responses": {
                "default": {"description": "anything"},
            }}},
    },
}


@pytest.fixture(scope="module")
def resp_validated(spark):
    rows = [
        # (tag, method, path, status, body)
        ("ok_200", "GET", "/things/7", 200, '{"id": 3}'),
        ("bad_body", "GET", "/things/7", 200, '{"id": 0}'),
        ("null_body", "GET", "/things/7", 200, None),
        ("ok_204_range", "GET", "/things/7", 204, None),   # 2XX, no schema
        ("ok_404_range", "GET", "/things/7", 404, None),
        ("undeclared_500", "GET", "/things/7", 500, None),
        ("default_catches", "POST", "/things", 599, None),
        ("no_route", "DELETE", "/things/7", 200, None),
    ]
    df = spark.createDataFrame(rows, ["tag", "method", "path", "status", "body"])
    v = OpenApiValidator(RESP_SPEC)
    return {
        r["tag"]: r
        for r in v.validate_responses(df).select(
            "tag", "operation_id", "row_valid", "failed_checks"
        ).collect()
    }


def test_response_exact_status_wins_over_range(resp_validated):
    # 200 resolves to the schema'd response, NOT the schemaless 2XX
    assert resp_validated["ok_200"]["row_valid"] is True
    assert resp_validated["bad_body"]["row_valid"] is False
    assert resp_validated["bad_body"]["failed_checks"] == ["body"]


def test_response_null_body_fails_when_schema_declared(resp_validated):
    assert resp_validated["null_body"]["row_valid"] is False
    assert resp_validated["null_body"]["failed_checks"] == ["body"]


def test_response_range_status_no_schema(resp_validated):
    assert resp_validated["ok_204_range"]["row_valid"] is True
    assert resp_validated["ok_404_range"]["row_valid"] is True


def test_response_undeclared_status(resp_validated):
    assert resp_validated["undeclared_500"]["row_valid"] is False
    assert "status_declared" in resp_validated["undeclared_500"]["failed_checks"]


def test_response_default_and_routing(resp_validated):
    assert resp_validated["default_catches"]["row_valid"] is True
    assert resp_validated["default_catches"]["operation_id"] == "makeThing"
    assert resp_validated["no_route"]["row_valid"] is False
    assert resp_validated["no_route"]["operation_id"] is None
    assert resp_validated["no_route"]["failed_checks"] == ["__no_route__"]


def test_response_bad_status_key_rejected():
    bad = {"info": {}, "paths": {"/x": {"get": {
        "operationId": "x", "responses": {"6XX": {"description": "?"}}}}}}
    with pytest.raises(OpenApiError, match="status key"):
        parse_spec(bad["paths"] and bad)


def test_header_and_cookie_parameters(spark):
    spec = {
        "info": {"title": "t", "version": "1"},
        "paths": {"/ping": {"get": {
            "operationId": "ping",
            "parameters": [
                {"name": "X-Api-Version", "in": "header", "required": True,
                 "schema": {"type": "integer", "minimum": 1}},
                {"name": "sid", "in": "cookie", "required": False,
                 "schema": {"type": "string", "minLength": 4}},
            ],
            "responses": {"200": {"description": "ok"}}}}},
    }
    rows = [
        ("ok", {"x-api-version": "2"}, {"sid": "abcd"}),
        ("ok_no_cookie", {"x-api-version": "1"}, {}),
        ("bad_header", {"x-api-version": "0"}, {}),
        ("missing_required_header", {}, {}),
        ("bad_cookie", {"x-api-version": "3"}, {"sid": "ab"}),
    ]
    df = spark.createDataFrame(
        [(t, "GET", "/ping", h, c) for t, h, c in rows],
        "tag string, method string, path string, headers map<string,string>, cookies map<string,string>",
    )
    got = {
        r["tag"]: (r["row_valid"], list(r["failed_checks"]))
        for r in OpenApiValidator(spec).validate(df).collect()
    }
    assert got["ok"] == (True, [])
    assert got["ok_no_cookie"] == (True, [])
    assert got["bad_header"] == (False, ["header.X-Api-Version"])
    assert got["missing_required_header"] == (False, ["header.X-Api-Version"])
    assert got["bad_cookie"] == (False, ["cookie.sid"])


# ---------------------------------------------------------------------------
# Styled query parameters (round-5): spaceDelimited / pipeDelimited /
# deepObject, checked row-by-row against an INDEPENDENTLY written
# pure-Python styled-parameter parser+validator (no shared code).
# ---------------------------------------------------------------------------

STYLED_SPEC = {
    "info": {"title": "styled", "version": "1"},
    "paths": {
        "/search": {
            "get": {
                "operationId": "search",
                "parameters": [
                    {"name": "tags", "in": "query", "required": False,
                     "style": "pipeDelimited",
                     "schema": {"type": "array", "minItems": 1, "maxItems": 3,
                                "items": {"type": "string",
                                          "enum": ["new", "sale", "bulk"]}}},
                    {"name": "ids", "in": "query", "required": True,
                     "style": "spaceDelimited",
                     "schema": {"type": "array", "maxItems": 2,
                                "items": {"type": "integer",
                                          "minimum": 0, "maximum": 9}}},
                    {"name": "filter", "in": "query", "required": False,
                     "style": "deepObject", "explode": True,
                     "schema": {"type": "object", "required": ["status"],
                                "properties": {
                                    "status": {"type": "string",
                                               "enum": ["open", "closed"]},
                                    "min_total": {"type": "number",
                                                  "minimum": 0}}}},
                ],
                "responses": {"200": {"description": "ok"}},
            }
        }
    },
}


def _py_int(s):
    try:
        v = float(s)
    except ValueError:
        return None
    return v if v == int(v) else None


def _py_validate_styled(query: dict) -> bool:
    """Independent reference implementation of the three styles over
    STYLED_SPEC — parses the serialized values itself."""
    # tags: pipeDelimited array of enum strings, 1..3 items, optional
    if "tags" in query:
        items = query["tags"].split("|")
        if not (1 <= len(items) <= 3):
            return False
        if any(i not in ("new", "sale", "bulk") for i in items):
            return False
    # ids: spaceDelimited array of ints 0..9, <=2 items, REQUIRED
    if "ids" not in query:
        return False
    items = query["ids"].split(" ")
    if len(items) > 2:
        return False
    for i in items:
        v = _py_int(i)
        if v is None or not (0 <= v <= 9):
            return False
    # filter: deepObject {status (required, enum), min_total (>=0)}
    f_keys = {k for k in query if k.startswith("filter[")}
    if f_keys:
        if "filter[status]" not in query:
            return False
        if query["filter[status]"] not in ("open", "closed"):
            return False
        if "filter[min_total]" in query:
            try:
                if float(query["filter[min_total]"]) < 0:
                    return False
            except ValueError:
                return False
    return True


STYLED_CASES = [
    {"ids": "3 7"},
    {"ids": "3 7", "tags": "new|sale"},
    {"ids": "0", "tags": "bulk"},
    {"ids": "3 7 9"},                          # 3 items > maxItems 2
    {"ids": "3 12"},                           # 12 > maximum 9
    {"ids": "3 x"},                            # non-integer item
    {"tags": "new"},                           # ids missing (required)
    {"ids": "1", "tags": "new|sale|bulk|new"}, # 4 items > maxItems 3
    {"ids": "1", "tags": "new|oops"},          # bad enum item
    {"ids": "1", "tags": ""},                  # empty string -> [''] bad enum
    {"ids": "1", "filter[status]": "open"},
    {"ids": "1", "filter[status]": "closed", "filter[min_total]": "10.5"},
    {"ids": "1", "filter[status]": "paused"},  # bad enum
    {"ids": "1", "filter[min_total]": "5"},    # required status missing
    {"ids": "1", "filter[status]": "open", "filter[min_total]": "-1"},  # < 0
    {"ids": "1", "filter[status]": "open", "filter[min_total]": "nope"},
]


def test_styled_params_match_independent_parser(spark):
    rows = [("GET", "/search", q) for q in STYLED_CASES]
    df = spark.createDataFrame(rows, "method string, path string, query map<string,string>")
    out = OpenApiValidator(STYLED_SPEC).validate(df)
    got = [bool(r["row_valid"]) for r in out.collect()]
    want = [_py_validate_styled(q) for q in STYLED_CASES]
    assert got == want, list(zip(STYLED_CASES, got, want))
    # sanity: the case list exercises both verdicts
    assert True in want and False in want


def test_styled_params_position_rejected():
    bad = {
        "info": {"title": "x", "version": "1"},
        "paths": {"/a/{id}": {"get": {
            "operationId": "a",
            "parameters": [{"name": "id", "in": "path",
                            "style": "deepObject", "schema": {}}],
            "responses": {"200": {"description": "ok"}}}}},
    }
    with pytest.raises(OpenApiError, match="deepObject"):
        parse_spec(bad)


def test_styled_params_seeded_fuzz_vs_independent_parser(spark):
    """Seeded randomized styled-parameter corpus (200 query maps mixing
    valid/invalid/absent values of all three styles plus junk noise
    keys) — engine row_valid must equal the independent pure-Python
    parser on every row."""
    import random

    rng = random.Random(20260821)
    # weighted toward VALID values so both verdicts are dense (an
    # all-invalid corpus exercises only one side of every predicate)
    tag_pool = ["new", "sale", "bulk", "oops", ""]
    tag_w = [4, 4, 4, 1, 1]
    id_pool = ["0", "3", "9", "12", "-1", "x", "3.5"]
    id_w = [5, 5, 5, 1, 1, 1, 1]
    status_pool = ["open", "closed", "paused", ""]
    status_w = [4, 4, 1, 1]
    min_pool = ["0", "10.5", "-1", "nope"]
    min_w = [4, 4, 1, 1]

    cases = []
    for _ in range(200):
        q = {}
        if rng.random() < 0.9:  # ids usually present (required)
            q["ids"] = " ".join(
                rng.choices(id_pool, weights=id_w, k=rng.randint(1, 2))
            )
        if rng.random() < 0.6:
            q["tags"] = "|".join(
                rng.choices(tag_pool, weights=tag_w, k=rng.randint(1, 4))
            )
        r = rng.random()
        if r < 0.4:
            q["filter[status]"] = rng.choices(status_pool, weights=status_w, k=1)[0]
        if 0.2 < r < 0.5:
            q["filter[min_total]"] = rng.choices(min_pool, weights=min_w, k=1)[0]
        if rng.random() < 0.3:
            q["noise"] = "zzz"  # undeclared key: must not affect verdict
        cases.append(q)

    rows = [("GET", "/search", q) for q in cases]
    df = spark.createDataFrame(rows, "method string, path string, query map<string,string>")
    out = OpenApiValidator(STYLED_SPEC).validate(df)
    got = [bool(r["row_valid"]) for r in out.collect()]
    want = [_py_validate_styled(q) for q in cases]
    mismatches = [(q, g, w) for q, g, w in zip(cases, got, want) if g != w]
    assert mismatches == [], mismatches[:5]
    assert 10 < sum(want) < 190  # corpus exercises both verdicts heavily
