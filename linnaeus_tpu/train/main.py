"""CLI: ``python -m linnaeus_tpu.train.main --cfg exp.yaml --opts K V ...``

Reference parity: linnaeus/main.py:356-423 (parse_option) + 2550-2643
(bootstrap). DDP/NCCL bootstrap is replaced by jax.distributed (multi-host)
+ a device mesh built inside the Trainer; per-process seeding derives from
MISC.SEED + jax.process_index().
"""

from __future__ import annotations

import argparse

from linnaeus_tpu.configuration import build_config, save_config
from linnaeus_tpu.utils.logging import create_h5data_logger, create_logger


def parse_option(argv=None):
    parser = argparse.ArgumentParser("linnaeus_tpu training")
    parser.add_argument("--cfg", type=str, default=None, help="experiment yaml")
    parser.add_argument(
        "--opts", nargs="*", default=None,
        help="config overrides: KEY VALUE [KEY VALUE ...]",
    )
    parser.add_argument(
        "--skip-validation", action="store_true",
        help="skip pending-validation replay and scheduled validations",
    )
    parser.add_argument(
        "--throughput", action="store_true",
        help="run the synthetic throughput test instead of training",
    )
    args = parser.parse_args(argv)
    config = build_config(args.cfg, opts=args.opts)
    config.freeze()
    return args, config


def enable_compile_cache(config) -> None:
    """Persistent XLA compilation cache (ENV.COMPILE_CACHE). Preemption
    resume and repeat runs then skip recompiling the train/eval steps."""
    cc = config.ENV.get("COMPILE_CACHE", None)
    if cc is None or not bool(cc.get("ENABLED", False)):
        return
    import os

    from linnaeus_tpu.utils.compile_cache import (
        enable_compile_cache as _enable,
    )

    base = str(cc.get("DIR", "")) or os.path.expanduser(
        "~/.cache/linnaeus_tpu/xla-cache"
    )
    _enable(base, float(cc.get("MIN_COMPILE_SECS", 1.0)))


def main(argv=None) -> None:
    args, config = parse_option(argv)

    import jax

    from linnaeus_tpu.utils.backend import honor_jax_platforms_env

    # the tunneled TPU plugin ignores the JAX_PLATFORMS env var; mirror it
    # into jax.config before any backend use (see utils/backend.py)
    honor_jax_platforms_env()

    enable_compile_cache(config)
    # multi-host init MUST precede the first backend touch
    # (jax.process_index() below initializes backends;
    # jax.distributed.initialize() after that raises) — the Trainer's own
    # call is an idempotent no-op after this one
    from linnaeus_tpu.parallel.mesh import initialize_multi_host

    initialize_multi_host(config)
    process_index = jax.process_index() if config.PARALLEL.MULTI_HOST else 0
    from linnaeus_tpu.configuration.utils import setup_output_dirs

    setup_output_dirs(config)
    log_dir = config.ENV.OUTPUT.DIRS.LOGS
    # DEBUG.VERBOSE_DEBUG: force both loggers to DEBUG so the per-flag
    # debug sites (check_debug_flag) become visible without touching levels
    level_main = config.EXPERIMENT.LOG_LEVEL_MAIN
    level_h5 = config.EXPERIMENT.LOG_LEVEL_H5DATA
    if bool(config.DEBUG.get("VERBOSE_DEBUG", False)):
        level_main = level_h5 = "DEBUG"
    create_logger(log_dir, level=level_main, process_index=process_index)
    create_h5data_logger(log_dir, level=level_h5, process_index=process_index)
    if config.EXPERIMENT.CODE_VERSION:
        # reference parity: surface the experiment's code version at startup
        # (main.py:458-459)
        from linnaeus_tpu.utils.logging import get_main_logger

        get_main_logger().critical(
            f"CODE VERSION: {config.EXPERIMENT.CODE_VERSION}"
        )
    if process_index == 0:
        save_config(
            config,
            f"{config.ENV.OUTPUT.DIRS.CONFIGS}/merged_config.yaml",
        )

    if args.throughput:
        from linnaeus_tpu.evaluation.throughput import throughput_test

        throughput_test(config)
        return

    from linnaeus_tpu.train.loop import Trainer

    trainer = Trainer(config, skip_validation=args.skip_validation)
    try:
        trainer.train()
    finally:
        # any in-flight async checkpoint flush must finalize before exit
        trainer.ckpt_writer.close()


if __name__ == "__main__":
    main()
