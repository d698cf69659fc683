"""Unit tests for the full-fidelity template kernel (reference
agent/component/template.py:113-147 semantics)."""

from __future__ import annotations

import json

from ragflow_spark.kernels.templater import decode_params, render_template


def test_conditional_and_loop():
    tpl = "{% if big %}YES{% else %}no{% endif %}:{% for w in ws %}<{{ w }}>{% endfor %}"
    assert render_template(tpl, json.dumps({"big": True, "ws": ["a", "b"]})) == (
        "YES:<a><b>"
    )
    assert render_template(tpl, json.dumps({"big": False, "ws": []})) == "no:"


def test_json_decode_of_string_params():
    # make_kwargs (template.py:142-147): string values that parse as
    # JSON become structured values
    tpl = "{% for x in items %}[{{ x }}]{% endfor %}"
    p = json.dumps({"items": "[1, 2, 3]"})
    assert render_template(tpl, p) == "[1][2][3]"
    assert decode_params(p)["items"] == [1, 2, 3]


def test_fallback_brace_substitution_and_json_dumps():
    # {key} single-brace placeholders survive Jinja and are regex-
    # substituted; non-strings go through json.dumps (template.py:127-140)
    assert render_template("n={n} s={s}", json.dumps({"n": 5, "s": "x"})) == (
        "n=5 s=x"
    )
    # backslashes in values are doubled
    assert render_template("p={p}", json.dumps({"p": "a\\b"})) == "p=a\\\\b"


def test_hash_padding_single_pass():
    # runs of # are padded once (documented deviation from the
    # reference's per-kwarg re-application, template.py:141)
    assert render_template("x ##y", "{}") == "x  ## y"


def test_render_error_leaves_content():
    # strict undefined -> render raises -> content unchanged
    # (the reference's bare except: pass, template.py:124-125)
    out = render_template("{{ missing }} {k}", json.dumps({"k": "v"}))
    assert out == "{{ missing }} v"


def test_autoescape():
    out = render_template("{{ v }}", json.dumps({"v": "<b>&"}))
    assert out == "&lt;b&gt;&amp;"
