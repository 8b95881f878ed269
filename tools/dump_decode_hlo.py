"""Dump optimized HLO for decode variants (diagnosis of the frame-loop
cost structure on the axon TPU backend)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import importlib
bdv = importlib.import_module("tools.bench_decode_variants")


def main():
    import jax
    import jax.numpy as jnp

    from dsr_tpu.asr import lvcsr
    from dsr_tpu.asr.decoder import topk_decoder as tk

    task = lvcsr.build_task(lvcsr.LvcsrConfig())
    g = tk.build_token_graph(task.graph)
    S, A, P = g.num_states, g.a_max, task.num_pdfs
    rng = np.random.default_rng(0)
    U, T = bdv.U, bdv.T
    ll = rng.standard_normal((U, T, P)).astype(np.float32)

    packed = jnp.concatenate(
        [g.weight, g.pdf.astype(jnp.float32), g.dst.astype(jnp.float32)],
        axis=1)

    # reuse the variant builder via module internals
    KCAP, NEG, BEAM = bdv.KCAP, bdv.NEG, bdv.BEAM

    for mode in sys.argv[1:] or ["exact", "noll", "noll2"]:
        fn = bdv.build(mode, g, P)
        lowered = fn.lower(ll, packed)
        comp = lowered.compile()
        txt = comp.as_text()
        out = f"/tmp/hlo_{mode}.txt"
        with open(out, "w") as f:
            f.write(txt)
        print(mode, "->", out, len(txt), "bytes")


if __name__ == "__main__":
    main()
