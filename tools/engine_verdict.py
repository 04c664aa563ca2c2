#!/usr/bin/env python
"""Keep-or-kill analysis for the bench's engine options (round-3 VERDICT
weak #3 / next #6): every engine option in the tree must have a row
showing where it wins, on its target hardware.

Reads bench_all.json and compares option rows against their default
twins:
  - am_chain_fused_pallas   vs am_chain_fused[<platform>]   (Pallas AM
    backend vs plain XLA chunked scans)
  - channelized_1024ch_conv vs channelized_1024ch           (one-pass
    depthwise-conv PFB accumulation vs 'shift')
  - wire-format rows vs their c64 twins (sanity: the lighter wire
    ingest should never lose)

Exit code 0 always (this is a report, not a gate). Run after a
platform: "tpu" artifact lands: `python tools/engine_verdict.py`.
"""

import json
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PAIRS = [
    ("am_chain_fused_pallas", "am_chain_fused[{plat}]",
     "Pallas AM backend (pallas/am_backend_scan.py)"),
    ("channelized_1024ch_conv", "channelized_1024ch",
     "conv PFB engine (ChannelizerConfig(engine='conv'))"),
    ("am_chain_fused_i16", "am_chain_fused[{plat}]", "raw-int16 ingest"),
    ("am_chain_fused_u8", "am_chain_fused[{plat}]", "RTL-SDR u8 ingest"),
    ("bank16_i16", "bank16", "raw-int16 ingest (bank)"),
    ("bank16_u8", "bank16", "u8 ingest (bank)"),
    ("channelized_1024ch_i16", "channelized_1024ch",
     "raw-int16 ingest (channelized)"),
    ("channelized_1024ch_u8", "channelized_1024ch",
     "u8 ingest (channelized)"),
]


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        HERE, "bench_all.json")
    rows = {r["name"]: r for r in json.load(open(path))}
    plat = next(iter(rows.values())).get("platform", "?")
    degraded = any(r.get("degraded") for r in rows.values())
    print(f"engine verdicts from {os.path.basename(path)} "
          f"(platform={plat}{', DEGRADED CPU fallback -- not the target '
          'hardware; verdicts are provisional' if degraded else ''})")
    for opt, base_t, label in PAIRS:
        base = base_t.format(plat=plat)
        ro, rb = rows.get(opt), rows.get(base)
        if not ro or not rb or "error" in ro or "error" in rb:
            why = ("missing" if not ro or not rb else "error row")
            print(f"  {label}: NO DATA ({why})")
            continue
        ratio = ro["value"] / rb["value"]
        verdict = "WINS" if ratio > 1.05 else (
            "parity" if ratio > 0.95 else "LOSES")
        print(f"  {label}: {verdict} ({ratio:.2f}x vs {base}: "
              f"{ro['value']/1e9:.2f} vs {rb['value']/1e9:.2f} Gsamp/s)")

    print("""
ROUND-5 STANDING VERDICTS (2026-08-21; silicon execution still blocked
by the relay's big-program d2h death, TPU_ATTEMPTS.md -- decided on the
evidence that exists per round-4 VERDICT #5):

1. PFB engine='conv': DEMOTED to a documented experiment.
   Evidence: 3.4x slower than 'shift' on the only measurable platform
   (6.76 vs 23.15 Msamp/s, CPU, round-4 bench_all.json). Structural:
   'shift''s blocked-matmul formulation already achieves the one-pass
   HBM traffic that motivated 'conv', and this backend's conv lowering
   is a known compile hazard (CLAUDE.md). Consequences: excluded from
   the bench; still equality-pinned (test_channelizer) and refused by
   the sharded channelizers. Revisit only on contrary TPU data.

2. Pallas AM backend (am_backend_scan): RETAINED as an experiment,
   TPU-only in the bench.
   Evidence: the CPU number (12.5 vs 54.9 Msamp/s) is interpret-mode
   and therefore uninformative; the kernel Mosaic-compiles for TPU
   (COMPILECHECK.json) and its claim -- the whole feedback loop
   VMEM-resident vs multiple HBM round trips for the XLA chunked
   scans -- is only testable on silicon. The bench measures its row
   exclusively on platform=tpu so no misleading CPU number is ever
   reported again.""")


if __name__ == "__main__":
    main()
