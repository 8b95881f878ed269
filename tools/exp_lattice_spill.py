"""Lattice-mode select-kernel spill rates at PRODUCTION settings (round-4
VERDICT weak #5 / item 6): the nlat certificate is deliberately
conservative (ops/pallas/select.py: ANY in-beam presort exclusion voids
the frame), so the question is how often it actually fires on REAL
decodes — if it fires on most frames, the kernel's 2× win does not apply
to the lattice paths (MMI denominators, consensus) and the auto-dispatch
policy must say so.

Runs on the chip: monophone bench graph (V=2000 trigram, synthetic AM +
in-domain synthesized utterances at the PRUNING.md noise point) and the
triphone graph through the DENSE token path (lattice decoding stays
dense), nlat ∈ {4, 8}, kcap=256, beams {30, 60}; also the 1-best
certificate at the same settings for comparison.  Results → KERNELS.md.

Run: /opt/venv/bin/python tools/exp_lattice_spill.py     (TPU; CPU via
LS_CPU=1 at reduced scale)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    if os.environ.get("LS_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from dsr_tpu.asr import lvcsr
    from dsr_tpu.asr.am import gmm as jgmm
    from dsr_tpu.asr.decoder import topk_decoder as tk

    N_UTT = int(os.environ.get("N_UTT", "8"))
    NOISE = float(os.environ.get("NOISE", "2.0"))

    def spill_rates(tag, task, tg, params, feats_list):
        # pad to ONE compile shape (axon remote-compiles every new T);
        # padded frames are masked by `length` and emit no spill
        Tp = max(len(f) for f in feats_list)
        Tp = ((Tp + 127) // 128) * 128
        rows = []
        for nlat in (0, 4, 8):
            for beam in (30.0, 60.0):
                tot_frames = 0
                tot_spill = 0
                for f in feats_list:
                    fp = np.zeros((Tp, f.shape[1]), np.float32)
                    fp[: len(f)] = f
                    ll = jgmm.loglik(params, jnp.asarray(fp))
                    out = tk.decode_with_tokens(
                        tg, ll, kcap=256, beam=beam, nlat=nlat,
                        length=len(f), select_mode="pallas",
                        return_spill=True)
                    sp = np.asarray(out[-1])[: len(f)]
                    tot_frames += len(f)
                    tot_spill += int(sp.sum())
                rows.append((tag, nlat, beam, tot_spill, tot_frames,
                             100.0 * tot_spill / max(tot_frames, 1)))
                print(f"| {tag} | {nlat} | {beam:.0f} | {tot_spill}/"
                      f"{tot_frames} | {rows[-1][5]:.2f}% |", flush=True)
        return rows

    print("| graph | nlat | beam | spill/frames | rate |")
    print("|---|---|---|---|---|")

    t0 = time.time()
    # ---- monophone bench graph, in-domain utterances --------------------
    task = lvcsr.build_task(lvcsr.LvcsrConfig())
    tg = tk.build_token_graph(task.graph)
    params = lvcsr.synthetic_am(task, var=4.0)
    rng0 = np.random.default_rng(task.cfg.seed)
    lex = lvcsr.make_lexicon(task.cfg.vocab_size, rng0)
    text = lvcsr.make_text(sorted(lex), task.cfg.n_tokens,
                           task.cfg.branching, rng0)
    rng = np.random.default_rng(1)
    feats = [lvcsr.synthesize_utterance(task, text[i][:8], rng, noise=NOISE)
             for i in range(N_UTT)]
    spill_rates("monophone", task, tg, params, feats)
    print(f"[{time.time()-t0:.0f}s] monophone done", flush=True)

    # ---- triphone graph (dense token path carries the lattice mode) -----
    ttask = lvcsr.build_task_tri()
    ttg = tk.build_token_graph(ttask.graph)
    tparams = lvcsr.synthetic_am_tri(ttask)
    rng0 = np.random.default_rng(ttask.cfg.seed)
    lex = lvcsr.make_lexicon(ttask.cfg.vocab_size, rng0)
    text = lvcsr.make_text(sorted(lex), ttask.cfg.n_tokens,
                           ttask.cfg.branching, rng0)
    tfeats = [lvcsr.synthesize_utterance_tri(ttask, text[i][:6], rng,
                                             noise=0.5)
              for i in range(min(N_UTT, 4))]
    spill_rates("triphone", ttask, ttg, tparams, tfeats)
    print(f"[{time.time()-t0:.0f}s] triphone done", flush=True)


if __name__ == "__main__":
    main()
