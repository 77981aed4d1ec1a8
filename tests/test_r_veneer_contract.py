"""Static contract test for the R veneer (R/bcm3tpu.r).

No R runtime exists in CI, so the reticulate veneer cannot be executed
here (documented in docs/MIGRATION.md). But the veneer adds no logic —
every function body is exactly one ``mod$<name>(...)`` call into
``bcm3_tpu.rbridge`` — so the part that can break silently is the
*call contract*: a veneer calling a Python function that does not exist,
or with the wrong number of arguments. This test parses the R source and
checks every call site against the live Python module:

  1. every ``mod$<name>`` exists in ``bcm3_tpu.rbridge`` and is callable;
  2. every call site's positional-argument count is accepted by the
     Python signature (no missing-required / too-many errors);
  3. every reference R accessor family (the ``bcm3.<family>.`` names the
     reference's evaluate_*.r scripts use, src/bcmrbridge/interface_*.cpp)
     is present in the veneer.
"""

import inspect
import re
from pathlib import Path

import pytest

VENEER = Path(__file__).resolve().parent.parent / "R" / "bcm3tpu.r"


def _strip_r_comments(text: str) -> str:
    # R has no multi-line comments; drop everything after # on each line.
    # Valid only while no string literal contains '#' — enforced by
    # test_string_literals_safe_for_parser below.
    return "\n".join(line.split("#")[0] for line in text.splitlines())


def _r_string_literals(text: str):
    """Yield every R string literal's contents, comment-aware."""
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if c == "#":  # comment to end of line
            while i < n and text[i] != "\n":
                i += 1
        elif c in ("'", '"'):
            quote, j = c, i + 1
            buf = []
            while j < n and text[j] != quote:
                if text[j] == "\\":
                    j += 1
                buf.append(text[j])
                j += 1
            yield "".join(buf)
            i = j
        i += 1


def _mod_calls(text: str):
    """Yield (name, n_args) for every ``mod$name(...)`` call site."""
    for m in re.finditer(r"mod\$(\w+)\s*\(", text):
        name = m.group(1)
        # walk to the matching close paren, counting top-level commas
        depth = 1
        i = m.end()
        n_commas = 0
        saw_token = False
        while depth > 0 and i < len(text):
            c = text[i]
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            elif c == "," and depth == 1:
                n_commas += 1
            elif not c.isspace() and depth >= 1:
                saw_token = True
            i += 1
        n_args = (n_commas + 1) if saw_token else 0
        yield name, n_args


@pytest.fixture(scope="module")
def veneer_calls():
    text = _strip_r_comments(VENEER.read_text())
    calls = list(_mod_calls(text))
    assert calls, "no mod$ calls found — parser or veneer broken"
    return text, calls


def test_every_veneer_call_resolves_with_valid_arity(veneer_calls):
    import bcm3_tpu.rbridge as rbridge

    _, calls = veneer_calls
    problems = []
    for name, n_args in calls:
        fn = getattr(rbridge, name, None)
        if fn is None or not callable(fn):
            problems.append(f"{name}: not a callable in bcm3_tpu.rbridge")
            continue
        sig = inspect.signature(fn)
        try:
            sig.bind(*range(n_args))
        except TypeError as e:
            problems.append(f"{name}({n_args} args): {e}")
    assert not problems, "\n".join(problems)


def test_every_reference_accessor_family_is_covered(veneer_calls):
    """The reference exports these families from bcmrbridge
    (src/bcmrbridge/interface_*.cpp) and its R scripts call them as
    bcm3.<family>.*; the veneer must define each family."""
    text, _ = veneer_calls
    defined = set(re.findall(r"(bcm3(?:\.\w+)+)\s*<-\s*function", text))
    families = {
        "init": "bcm3.init.cpp",
        "reinit": "bcm3.reinit.cpp",
        "release": "bcm3.release.cpp",
        "popPK": "bcm3.popPK.get.likelihood",
        "PK": "bcm3.PK.get.likelihood",
        "ODE": "bcm3.ODE.get.likelihood",
        "pharmacosingle": "bcm3.pharmacosingle.get.likelihood",
        "pharmacopop": "bcm3.pharmacopop.get.likelihood",
        "incucyte": "bcm3.incucyte.get.likelihood",
        "fISA": "bcm3.fISA.get.likelihood",
        "cellpop": "bcm3.cellpop.get.likelihood",
    }
    missing = [r_name for r_name in families.values() if r_name not in defined]
    assert not missing, f"veneer missing reference entry points: {missing}"


def test_string_literals_safe_for_parser():
    """The comment stripper and arity counter above assume no string
    literal contains '#' (would truncate the line) or ',' / parens
    (would miscount a call's arity). Enforce that assumption so a
    future veneer edit cannot silently corrupt the contract check."""
    unsafe = [
        s
        for s in _r_string_literals(VENEER.read_text())
        if any(ch in s for ch in "#,()")
    ]
    assert not unsafe, (
        "string literal(s) would break the veneer parser; rewrite them "
        f"or make the parser string-aware: {unsafe}"
    )


def test_trailing_veneer_functions_return_module_results(veneer_calls):
    """Guard against a veneer function that forgets to call into the
    module at all: every bcm3.* function body must contain either a
    mod$ call or operate on a previously fetched result."""
    text, _ = veneer_calls
    bodies = re.split(r"(?=bcm3(?:\.\w+)+\s*<-\s*function)", text)
    for body in bodies[1:]:
        header = body.splitlines()[0]
        assert "mod" in body, f"veneer fn without module call: {header}"
