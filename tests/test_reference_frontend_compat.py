"""Wire-shape compatibility with the REFERENCE frontend.

``bind_eel`` + ``bridge_callbacks_to_eel`` (cbas_tpu/app/api.py) claim the
reference's Electron pages can talk to this Api unchanged. That only holds if
every ``eel.<name>(args...)`` call site in /root/reference/frontend/js/ binds
to an Api method that accepts that many positional arguments. This test
parses the actual reference JS call sites and asserts each one is callable —
the same audit that caught 12 arity mismatches (since fixed, r3).
"""

import glob
import inspect
import os
import re

import pytest

from cbas_tpu.app.api import Api

REF_JS = "/root/reference/frontend/js"

# Names the reference JS calls that are NOT remote procedures.
_NOT_RPC = {"expose", "_websocket"}


def _reference_call_arities():
    """{name: {positional-arg counts seen at reference JS call sites}}."""
    calls = {}
    for path in glob.glob(os.path.join(REF_JS, "*.js")):
        src = open(path).read()
        for m in re.finditer(r"eel\.([a-zA-Z_][a-zA-Z_0-9]*)\(", src):
            name = m.group(1)
            if name in _NOT_RPC:
                continue
            # Count top-level commas in the argument list (strings and
            # nested brackets skipped).
            i, depth, args, content = m.end(), 1, 0, False
            while i < len(src) and depth:
                c = src[i]
                if c in "([{":
                    depth += 1
                elif c in ")]}":
                    depth -= 1
                elif depth == 1 and c == ",":
                    args += 1
                elif not c.isspace():
                    content = True
                if c in "'\"`":
                    q = c
                    i += 1
                    while i < len(src) and src[i] != q:
                        i += 2 if src[i] == "\\" else 1
                i += 1
            calls.setdefault(name, set()).add(args + 1 if content else 0)
    return calls


@pytest.mark.skipif(not os.path.isdir(REF_JS), reason="reference not mounted")
def test_every_reference_js_call_site_binds():
    calls = _reference_call_arities()
    assert len(calls) > 60, "reference JS parse produced implausibly few calls"
    problems = []
    for name, arities in sorted(calls.items()):
        fn = getattr(Api, name, None)
        if fn is None:
            problems.append(f"{name}: missing on Api (called with {sorted(arities)} args)")
            continue
        sig = inspect.signature(fn)
        params = [p for p in sig.parameters.values() if p.name != "self"]
        required = sum(
            1
            for p in params
            if p.default is inspect.Parameter.empty
            and p.kind in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD)
        )
        maxpos = sum(
            1
            for p in params
            if p.kind in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD)
        )
        has_var = any(p.kind == p.VAR_POSITIONAL for p in params)
        for n in sorted(arities):
            if n < required or (n > maxpos and not has_var):
                problems.append(
                    f"{name}: reference calls with {n} args, ours accepts "
                    f"{required}..{'*' if has_var else maxpos}"
                )
    assert not problems, "\n".join(problems)


def test_train_model_reference_positional_order():
    """The 17-positional order matches the reference exactly
    (backend/label_train_page.py:1804-1808), including its string->number
    coercion of JS form values."""
    order = [k for k, _ in Api._TRAIN_POSITIONAL]
    assert order == [
        "batch_size", "learning_rate", "epochs", "sequence_length",
        "training_method", "patience", "num_runs", "num_trials",
        "optimization_target", "use_test", "test_split", "custom_weights",
        "weight_decay", "label_smoothing", "lstm_hidden_size", "lstm_layers",
    ]
