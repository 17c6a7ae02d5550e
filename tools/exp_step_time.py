"""A/B harness: full flagship train-step time under attention layout variants.

Usage: python tools/exp_step_time.py <legacy|nminor|split|split2> <first|last> [batch]
('split' = split_cls_stream residual pair, concat CLS merge; 'split2' = the
same with the concat-free streaming merge; cls_pos arg is ignored for both.)
Prints one line: variant, ms/step, clips/s. (Relay-safe timing: scalar fetch.)
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from oatx.models import distilbert as dbert
    from oatx.models import towers
    from oatx.models import vit_spacetime as vst
    from oatx.ops import attention as A
    from oatx.train import optim, step as steplib

    layout = sys.argv[1] if len(sys.argv) > 1 else "legacy"
    cls_pos = sys.argv[2] if len(sys.argv) > 2 else "first"
    bs = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    split = layout in ("split", "split2")
    A.set_layout("legacy" if split else layout)
    if layout == "split2":
        A.set_split_merge("stream")
    rng = np.random.default_rng(0)
    batch = {
        "video": jnp.asarray(rng.standard_normal((bs, 4, 224, 224, 3)), jnp.bfloat16),
        "input_ids": jnp.asarray(rng.integers(0, 30522, (bs, 24))),
        "attention_mask": jnp.ones((bs, 24), jnp.int32),
    }
    cfg = towers.TowerConfig(
        video=vst.SpaceTimeViTConfig(num_frames=4, time_init="zeros",
                                     cls_position=cls_pos,
                                     split_cls_stream=split),
        text=dbert.DistilBertConfig(), projection_dim=256,
        variant="baseline", compute_dtype=jnp.bfloat16)
    optimizer = optim.make_optimizer(lr=2e-4)
    state = steplib.init_state(jax.random.PRNGKey(0), cfg, optimizer)
    train_step = steplib.make_train_step(cfg, steplib.LossConfig(), optimizer)
    t0 = time.perf_counter()
    state, m = train_step(state, batch)
    l0 = float(m["loss"])
    print(f"compile+step1 {time.perf_counter()-t0:.1f}s loss0={l0:.4f}", flush=True)
    for _ in range(3):
        state, m = train_step(state, batch)
    _ = float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(20):
        state, m = train_step(state, batch)
    _ = float(m["loss"])
    dt = (time.perf_counter() - t0) / 20
    print(f"RESULT {layout}/{cls_pos}/bs{bs}: {dt*1e3:.2f} ms/step  {bs/dt:.1f} clips/s")


if __name__ == "__main__":
    main()
