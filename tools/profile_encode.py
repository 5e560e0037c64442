"""Profile the encode kernel (no Spark): cProfile + per-column timing
of engine._encode_chunk over a realistic transcript chunk.

Run:  python3 tools/profile_encode.py [n_conv] [block_rows]
"""
import cProfile
import io
import pstats
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import pyarrow as pa

from oroch_spark import engine, transcripts

KINDS = [("conv_id", "str"), ("turn_idx", "i32"), ("role", "str"),
         ("text", "str"), ("tool", "str"), ("ts", "ts")]


def main():
    n_conv = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    block_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 65536
    pdf = transcripts.generate_pandas(n_conv, seed=1234)
    tbl = pa.Table.from_pandas(pdf, preserve_index=False)
    tbl = tbl.slice(0, min(block_rows, tbl.num_rows))
    n = tbl.num_rows
    print(f"rows: {n}")

    # warm
    engine._encode_chunk(tbl, 0, 0, KINDS, ["conv_id", "turn_idx"],
                         frozenset(["text"]))

    # per-column wall
    for name, kind in KINDS:
        arr = tbl.column(name).combine_chunks()
        t0 = time.time()
        for _ in range(3):
            engine._encode_column(arr, kind, name == "text", name=name)
        dt = (time.time() - t0) / 3
        print(f"  {name:10s} {kind:5s} {dt*1e3:8.1f} ms "
              f"{n/dt/1e6:6.2f} Mrows/s")

    pr = cProfile.Profile()
    pr.enable()
    for _ in range(3):
        engine._encode_chunk(tbl, 0, 0, KINDS, ["conv_id", "turn_idx"],
                             frozenset(["text"]))
    pr.disable()
    s = io.StringIO()
    pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(30)
    print(s.getvalue())


if __name__ == "__main__":
    main()
