"""Transform unit tests (SURVEY.md §2.2; moment-token table §7.6-2;
JS-regex translation §7.6-5; vectorized == scalar equivalence)."""

import pyarrow as pa
import pytest

from goose_parser_ray.transforms import TransformError, compile_chain, register_transform
from goose_parser_ray.transforms.jsregex import (
    RegexTranslationError,
    translate_js_regex,
    translate_js_replacement,
)
from goose_parser_ray.transforms.momentfmt import (
    MomentFormatError,
    MomentFormatter,
    MomentParser,
)


def run(specs, value):
    return compile_chain(specs).apply_scalar(value)


# --- individual transforms -------------------------------------------------


def test_trim():
    assert run([{"type": "trim"}], "  x \n") == "x"


def test_replace_global_vs_first():
    assert run([{"type": "replace", "re": ["o", "g"], "to": "0"}], "foo") == "f00"
    assert run([{"type": "replace", "re": ["o"], "to": "0"}], "foo") == "f0o"


def test_replace_backrefs():
    specs = [{"type": "replace", "re": ["(\\w+), (\\w+)"], "to": "$2 $1"}]
    assert run(specs, "Doe, John") == "John Doe"


def test_replace_case_insensitive():
    assert run([{"type": "replace", "re": ["ab", "gi"], "to": "-"}], "AbaB") == "--"
    assert run([{"type": "replace", "re": ["ab", "i"], "to": "-"}], "xAbaB") == "x-aB"


def test_date_en():
    specs = [{"type": "date", "from": "HH:mm D MMMM YYYY", "to": "YYYY-MM-DD HH:mm"}]
    assert run(specs, "21:00 30 August 2016") == "2016-08-30 21:00"


def test_date_ru_locale():
    specs = [{"type": "date", "locale": "ru", "from": "D MMMM YYYY", "to": "YYYY-MM-DD"}]
    assert run(specs, "8 сентября 2016") == "2016-09-08"


def test_date_ampm_and_literal_T():
    specs = [{"type": "date", "from": "D MMM YY, h:mm a", "to": "YYYY-MM-DDTHH:mm:ss"}]
    assert run(specs, "5 Sep 16, 9:41 pm") == "2016-09-05T21:41:00"


def test_date_unparseable_empty():
    specs = [{"type": "date", "from": "YYYY-MM-DD", "to": "YYYY"}]
    assert run(specs, "not a date") == ""


def test_split_index_and_array():
    assert run([{"type": "split", "separator": ",", "index": 1}], "a,b,c") == "b"
    assert run([{"type": "split", "separator": ","}], "a,b") == ["a", "b"]
    assert run([{"type": "split", "separator": ",", "index": 9}], "a,b") == ""


def test_join():
    specs = [{"type": "split", "separator": ","}, {"type": "join", "glue": "|"}]
    assert run(specs, "a,b,c") == "a|b|c"


def test_match_groups():
    specs = [{"type": "match", "re": ["(\\d+)-(\\d+)"], "index": 2}]
    assert run(specs, "r 10-25 z") == "25"
    assert run([{"type": "match", "re": ["\\d+"]}], "none") == ""
    assert run([{"type": "match", "re": ["x"], "index": 5}], "x") == ""


def test_pick_get():
    assert run([{"type": "pick", "prop": ["a"]}], {"a": 1, "b": 2}) == {"a": 1}
    assert run([{"type": "get", "path": "a.b"}], {"a": {"b": "v"}}) == "v"
    assert run([{"type": "get", "path": "1"}], ["x", "y"]) == "y"
    assert run([{"type": "get", "path": "a.zz"}], {"a": {}}) == ""


def test_combine_compare_decode():
    assert run([{"type": "combine", "glue": " "}], ["a", "b"]) == "a b"
    assert run([{"type": "compare", "value": "v"}], "v") is True
    assert run([{"type": "compare", "value": "v"}], "w") is False
    assert run([{"type": "decodeHTML"}], "a &amp; b") == "a & b"


def test_chain_order_matters():
    ab = [{"type": "replace", "re": ["^x+"], "to": " "}, {"type": "trim"}]
    ba = [{"type": "trim"}, {"type": "replace", "re": ["^x+"], "to": " "}]
    assert run(ab, "xxxv") == "v"
    assert run(ba, "xxxv") == " v"


def test_elementwise_over_arrays():
    specs = [{"type": "split", "separator": ","}, {"type": "trim"}]
    assert run(specs, " a , b ") == ["a", "b"]


def test_custom_transform_registry():
    register_transform("shout", lambda v: str(v).upper() + "!")
    assert run([{"type": "shout"}], "hi") == "HI!"


def test_unknown_transform_rejected():
    with pytest.raises(TransformError):
        compile_chain([{"type": "nope-no-such"}])


# --- js regex translation --------------------------------------------------


def test_js_flags():
    pat, g = translate_js_regex("a", "gi")
    assert g and pat.search("A")
    with pytest.raises(RegexTranslationError):
        translate_js_regex("a", "u")


def test_js_replacement_tokens():
    assert translate_js_replacement("$1-$2") == "\\1-\\2"
    assert translate_js_replacement("[$&]") == "[\\g<0>]"
    assert translate_js_replacement("$$x") == "$x"


# --- moment tokens ---------------------------------------------------------


@pytest.mark.parametrize(
    "fmt,value,expect",
    [
        ("YYYY-MM-DD", "2020-01-05", (2020, 1, 5, 0, 0)),
        ("D.M.YY", "7.3.99", (1999, 3, 7, 0, 0)),
        ("Do MMMM YYYY", "21st August 2016", (2016, 8, 21, 0, 0)),
        ("MMM D YYYY H:mm", "Sep 5 2016 7:45", (2016, 9, 5, 7, 45)),
        ("dddd, D MMMM YYYY", "Tuesday, 30 August 2016", (2016, 8, 30, 0, 0)),
    ],
)
def test_moment_parse(fmt, value, expect):
    dt = MomentParser(fmt).parse(value)
    assert (dt.year, dt.month, dt.day, dt.hour, dt.minute) == expect


def test_moment_format_locales():
    import datetime

    dt = datetime.datetime(2016, 9, 8, 21, 5, 7)
    assert MomentFormatter("D MMMM YYYY", "ru").format(dt) == "8 сентября 2016"
    assert MomentFormatter("dddd", "de").format(dt) == "Donnerstag"
    assert MomentFormatter("Do MMM, h:mm a").format(dt) == "8th Sep, 9:05 pm"


def test_moment_unknown_locale():
    with pytest.raises(MomentFormatError):
        MomentParser("YYYY", "xx")


# --- vectorized equivalence ------------------------------------------------


@pytest.mark.parametrize(
    "specs",
    [
        [{"type": "trim"}],
        [{"type": "replace", "re": ["o", "g"], "to": "0"}],
        [{"type": "replace", "re": ["(a)(b)"], "to": "$2$1"}],  # scalar fallback
        [{"type": "split", "separator": " "}, {"type": "join", "glue": "-"}],
        [{"type": "date", "from": "YYYY/MM/DD", "to": "DD.MM.YYYY"}],
        [{"type": "match", "re": ["\\d+"]}],
        [{"type": "decodeHTML"}],
    ],
)
def test_vectorized_equals_scalar(specs):
    vals = ["  hello world  ", "foo oo ab", "1999/12/31", "", "x &amp; 42"]
    chain = compile_chain(specs)
    vec = chain.apply_array(pa.array(vals)).to_pylist()
    sca = [chain.apply_scalar(v) for v in vals]
    assert vec == sca
