"""Full-fidelity template rendering (reference agent/component/
template.py:113-147):

1. every parameter value is JSON-decoded when possible
   (make_kwargs, template.py:142-147);
2. the content is rendered as a sandboxed Jinja template with
   autoescape + strict undefined (template.py:116-125) — a render
   error leaves the content unchanged (the bare ``except: pass``);
3. remaining ``{key}`` placeholders are regex-substituted with the
   string form of the value — ``json.dumps`` for non-strings,
   backslashes doubled (template.py:127-140);
4. runs of ``#`` are padded with spaces (template.py:141).

Deviation (documented): the reference applies step 4 inside the
per-kwarg loop, so a template with k parameters pads ``#`` runs k
times, growing one space pair per parameter — an accidental quirk,
not a spec. Here it is applied exactly once after all substitutions.

jinja2 ships with this environment (pandas dependency); if absent,
step 2 degrades to a no-op exactly like the reference's swallowed
render error, and the ``{key}`` fallback still substitutes.
"""

from __future__ import annotations

import json
import re

try:
    from jinja2.sandbox import SandboxedEnvironment
    from jinja2 import StrictUndefined

    _ENV = SandboxedEnvironment(autoescape=True, undefined=StrictUndefined)
except ImportError:  # degrade like the reference's except: pass
    _ENV = None

_HASH_RUN_RE = re.compile(r"(#+)")


def decode_params(params_json: str) -> dict:
    """make_kwargs analog: JSON-decode each value when possible."""
    raw = json.loads(params_json) if params_json else {}
    out = {}
    for k, v in raw.items():
        if isinstance(v, str):
            try:
                v = json.loads(v)
            except (ValueError, TypeError):
                pass
        out[k] = v
    return out


def render_template(content: str, params_json: str) -> str:
    kwargs = decode_params(params_json)
    if _ENV is not None:
        try:
            content = _ENV.from_string(content).render(kwargs)
        except Exception:  # noqa: BLE001 — reference template.py:124-125
            pass
    for n, v in kwargs.items():
        if not isinstance(v, str):
            try:
                v = json.dumps(v, ensure_ascii=False)
            except (ValueError, TypeError):
                v = str(v)
        v = v.replace("\\", "\\\\")
        content = re.sub(
            r"\{%s\}" % re.escape(n), lambda _m, _v=v: _v, content
        )
    return _HASH_RUN_RE.sub(r" \1 ", content)
