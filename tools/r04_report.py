"""Summarize the round-4 measurement logs (/tmp/r04/*.log) into markdown.

Each log is a tpu_run.sh capture; the benches print one-or-more JSON lines.
This collates them into the tables BENCH_NOTES_r04.md needs:

- official bench rows (tag, RTF, min-max, precision, regime, canary)
- frontend shoot-out variants per geometry (ms + RTF)
- off-family dispatch probe rows (winner per geometry)
- serving overload row (p50/p99, canary correlation)
- corpus rows (RTF, bytes, transfer tier)

Usage: python tools/r04_report.py [logdir]   (default /tmp/r04)
"""
import json
import pathlib
import sys


def json_lines(path):
    out = []
    for line in path.read_text().splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                out.append(json.loads(line))
            except json.JSONDecodeError:
                pass
    return out


def fmt(v, nd=1):
    if isinstance(v, float):
        return f"{v:,.{nd}f}"
    if isinstance(v, int):
        return f"{v:,}"
    return str(v)


def main():
    d = pathlib.Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/r04")
    logs = {p.stem: json_lines(p) for p in sorted(d.glob("*.log"))}

    bench_tags = [t for t in logs if t.startswith("bench_")]
    if bench_tags:
        print("## official bench rows\n")
        print("| tag | RTF | min-max | precision | regime | canary ms |")
        print("|---|---|---|---|---|---|")
        for t in bench_tags:
            rows = [r for r in logs[t] if "value" in r]
            if not rows:
                print(f"| {t} | (no JSON — see {t}.log) | | | | |")
                continue
            r = rows[-1]
            mm = f"[{fmt(r.get('min', 0), 0)}–{fmt(r.get('max', 0), 0)}]"
            print(
                f"| {t} | **{fmt(r['value'], 0)}** | {mm} "
                f"| {r.get('precision', '?')} | {r.get('regime', '?')} "
                f"| {fmt(r.get('canary_d2h_ms', -1), 2)} |"
            )
        print()

    shoot_tags = [t for t in logs if t.startswith(("shoot_", "split_", "off_"))]
    if shoot_tags:
        print("## frontend shoot-outs / probes\n")
        for t in shoot_tags:
            rows = logs[t]
            variants = [r for r in rows if "variant" in r]
            if not variants:
                print(f"- {t}: (no variant rows — see {t}.log)")
                continue
            timed = [r for r in variants if "ms_per_batch" in r]
            if not timed:
                print(f"- {t}: (all variants skipped — see {t}.log)")
                continue
            best = min(timed, key=lambda r: r["ms_per_batch"])
            cells = ", ".join(
                f"{r['variant']} {fmt(r['ms_per_batch'], 2)}ms" for r in timed
            )
            print(f"- **{t}** → winner `{best['variant']}` | {cells}")
        print()

    online_tags = [t for t in logs if t.startswith("online")]
    for t in online_tags:
        print(f"## serving ({t})\n")
        for r in logs[t]:
            print("```json\n" + json.dumps(r) + "\n```")
        print()

    corpus_tags = [t for t in logs if t.startswith("corpus")]
    if corpus_tags:
        print("## corpus rows\n")
        for t in corpus_tags:
            for r in logs[t]:
                print(f"- **{t}**: {json.dumps(r)}")
        print()


if __name__ == "__main__":
    main()
