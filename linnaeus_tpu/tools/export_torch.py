"""Export a trained checkpoint to a reference-loadable torch state_dict.

The migration path BACK: checkpoints trained here load into the reference
framework's own mFormerV1 (``model.load_state_dict(torch.load(out))``),
inverse of ``utils/pretrained.py::load_reference_mformer_v1`` — both walk
the same declarative entry table, so they cannot drift. Logit parity of
the round trip is pinned by
``tests/test_parity_reference.py::test_export_to_reference_round_trip``.

Usage:
  python -m linnaeus_tpu.tools.export_torch \
      --cfg experiment.yaml --checkpoint <ckpt_dir> --out model.pth

MoE checkpoints export their dense twin (expert banks averaged — exact
when experts have not diverged, a best-effort distillation otherwise; the
reference has no MoE to receive them).
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def export_checkpoint(config, checkpoint_path: str, out_path: str) -> dict:
    import orbax.checkpoint as ocp

    from linnaeus_tpu.utils.checkpoint import STATE_DIR
    from linnaeus_tpu.utils.meta import get_enabled_meta_components
    from linnaeus_tpu.utils.pretrained import (
        export_reference_mformer_v1,
        jax_to_py,
    )

    if str(config.MODEL.TYPE) != "mFormerV1":
        raise ValueError(
            "export_torch currently supports mFormerV1 (the reference's "
            "flagship); mFormerV0 checkpoints originate from MetaFG torch "
            "weights in the first place"
        )

    state_dir = os.path.join(checkpoint_path, STATE_DIR)
    with ocp.StandardCheckpointer() as ckptr:
        state = ckptr.restore(os.path.abspath(state_dir))
    params = state["params"] if "params" in state else state

    task_keys = tuple(config.DATA.TASK_KEYS_H5)
    from linnaeus_tpu.utils.pretrained import (
        _is_moe_params,
        average_experts_into_dense,
    )

    if _is_moe_params(params):
        params = average_experts_into_dense(params)

    # only the geometry is needed for the mapping — straight from config
    # (no model build: hierarchical heads would demand a taxonomy tree;
    # non-Linear heads simply have no reference fc analog and are skipped)
    sd = export_reference_mformer_v1(
        jax_to_py(params),
        convnext_depths=tuple(config.MODEL.CONVNEXT_STAGES.DEPTHS),
        rope_depths=tuple(config.MODEL.ROPE_STAGES.DEPTHS),
        meta_names=tuple(n for n, _ in get_enabled_meta_components(config)),
        task_keys=task_keys,
    )
    import torch  # the whole point is a torch-loadable artifact

    torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in sd.items()}, out_path)
    return sd


def main(argv=None) -> None:
    parser = argparse.ArgumentParser("export_torch")
    parser.add_argument("--cfg", required=True, help="experiment yaml")
    parser.add_argument("--checkpoint", required=True, help="checkpoint dir")
    parser.add_argument("--out", required=True, help="output .pth path")
    args = parser.parse_args(argv)

    from linnaeus_tpu.configuration import build_config

    config = build_config(args.cfg)
    sd = export_checkpoint(config, args.checkpoint, args.out)
    print(f"exported {len(sd)} tensors -> {args.out}")


if __name__ == "__main__":
    main()
