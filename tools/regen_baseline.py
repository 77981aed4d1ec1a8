"""Regenerate BASELINE.md's numbers-of-record block from a driver bench
artifact (BENCH_rNN.json) — the mechanical step VERDICT r3/r4 asked for,
so BASELINE.md can never trail the artifact again.

Usage: python tools/regen_baseline.py BENCH_r05.json

Rewrites the block between the BENCH_AUTO markers in BASELINE.md with a
table of every metric in the artifact's JSON line. Run it right after
a driver capture (or any `python bench.py > out.json` run: pass the
file containing the JSON line).
"""

import json
import re
import sys
import os

BEGIN = "<!-- BENCH_AUTO_BEGIN -->"
END = "<!-- BENCH_AUTO_END -->"

ROWS = [
    # (key, label, unit, vs_key)
    ("value", "PopPK expm PT-MCMC evals/sec (headline, e2e)", "evals/s",
     "vs_baseline"),
    ("device_only_evals_per_sec", "headline device-only", "evals/s", None),
    ("ess_per_sec", "headline ESS/sec", "ESS/s", None),
    ("transit_evals_per_sec", "PopPK transit (batched DP5)", "evals/s",
     "transit_vs_baseline"),
    ("transit_ess_per_sec", "transit ESS/sec", "ESS/s", None),
    ("adapted_evals_per_sec", "adapted-regime evals/sec", "evals/s", None),
    ("adapted_ess_per_sec", "adapted ESS/sec", "ESS/s", None),
    ("adaptation_boundary_seconds", "adaptation boundary (warm)", "s", None),
    ("nuts_ess_per_sec", "NUTS on TPU ESS/sec", "ESS/s", None),
    ("nuts_divergence_rate", "NUTS divergence rate", "", None),
    ("cellpop_evals_per_sec", "cellpop 5-species", "evals/s",
     "cellpop_vs_baseline"),
    ("cellpop21_evals_per_sec", "cellpop 21-species (sparse solver)",
     "evals/s", "cellpop21_vs_baseline"),
    ("cellpop_matched_evals_per_sec", "cellpop Hungarian-matched",
     "evals/s", "cellpop_matched_vs_baseline"),
    ("pharmaco_evals_per_sec", "pharmaco population (expm)", "evals/s",
     "pharmaco_vs_baseline"),
    ("incucyte_evals_per_sec", "incucyte delay-ODE", "evals/s",
     "incucyte_vs_baseline"),
    ("fisa_evals_per_sec", "fISA multiroot steady-state", "evals/s", None),
    ("banana_ess_per_sec", "banana engine ESS/sec", "ESS/s",
     "banana_vs_baseline"),
    ("banana_ess_per_sec_unadapted", "banana ESS/sec (never-adapted A/B)",
     "ESS/s", None),
    ("circular_ess_per_sec", "circular-ridge ESS/sec", "ESS/s", None),
    ("circular_ess_per_sec_unadapted",
     "circular-ridge ESS/sec (never-adapted A/B)", "ESS/s", None),
]


def load_bench_json(path):
    with open(path) as f:
        txt = f.read()
    try:
        d = json.loads(txt)
        # driver artifact wraps the bench line in "tail"
        if "tail" in d and "metric" not in d:
            txt = d["tail"]
    except json.JSONDecodeError:
        pass
    # find the JSON line with "metric"
    for line in reversed(txt.splitlines()):
        line = line.strip()
        if line.startswith("{") and '"metric"' in line:
            return json.loads(line)
    # driver tail may truncate the head of the line; try a brace scan
    ix = txt.find('{"metric"')
    if ix >= 0:
        return json.loads(txt[ix:])
    raise SystemExit(f"no bench JSON line found in {path}")


def fmt(v):
    if v is None:
        return "—"
    if isinstance(v, float):
        if v != v:
            return "nan"
        if abs(v) >= 100:
            return f"{v:,.0f}"
        if abs(v) >= 1:
            return f"{v:,.2f}"
        return f"{v:.4g}"
    return str(v)


def render(d, source):
    lines = [
        BEGIN,
        f"### Numbers of record (auto-generated from `{source}` — "
        "regenerate with `python tools/regen_baseline.py <artifact>`)",
        "",
        "| metric | value | vs 2-thread CPU anchor |",
        "|---|---|---|",
    ]
    for key, label, unit, vs_key in ROWS:
        if key not in d or d[key] is None:
            continue
        vs = d.get(vs_key) if vs_key else None
        vs_s = f"**{fmt(vs)}×**" if vs is not None else "—"
        lines.append(f"| {label} | {fmt(d[key])} {unit} | {vs_s} |")
    par = d.get("banana_acceptance_parity")
    if par and par.get("max_abs_diff_exchange") is not None:
        lines.append(
            f"| banana acceptance parity (TPU vs C++ engine) | "
            f"max diff mutate {fmt(par['max_abs_diff_mutate'])}, "
            f"exchange {fmt(par['max_abs_diff_exchange'])} | — |"
        )
    lines.append(END)
    return "\n".join(lines)


def main():
    artifact = sys.argv[1] if len(sys.argv) > 1 else "BENCH_r05.json"
    root = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    baseline = os.path.join(root, "BASELINE.md")
    d = load_bench_json(
        artifact if os.path.isabs(artifact) else os.path.join(root, artifact)
    )
    with open(baseline) as f:
        md = f.read()
    block = render(d, os.path.basename(artifact))
    if BEGIN in md:
        md = re.sub(
            re.escape(BEGIN) + r".*?" + re.escape(END), block, md,
            flags=re.DOTALL,
        )
    else:
        # insert after the "## Measured results" heading
        anchor = "## Measured results (numbers of record)"
        ix = md.find(anchor)
        if ix < 0:
            md += "\n\n" + block + "\n"
        else:
            eol = md.find("\n", ix)
            md = md[: eol + 1] + "\n" + block + "\n" + md[eol + 1 :]
    with open(baseline, "w") as f:
        f.write(md)
    print(f"BASELINE.md numbers-of-record block regenerated from {artifact}")


if __name__ == "__main__":
    main()
