"""Command-line interface: `python -m volpick_tpu <command>`.

Commands
--------
pick      pick P/S phases on miniSEED/SAC files with a pretrained model
train     train from a JSON config (same as python -m volpick_tpu.train.trainer)
targets   generate task0/task1/task23 evaluation target CSVs for a dataset
evaluate  run the task0 threshold sweep + task1/2/3 scoring
bench     run the TPU throughput benchmark
"""

from __future__ import annotations

import argparse
import json
import sys


def _cmd_pick(args):
    import volpick_tpu

    volpick_tpu.enable_compilation_cache()
    from volpick_tpu.core.stream import Stream
    from volpick_tpu.models import from_pretrained
    from volpick_tpu.picker import WaveformPicker

    stream = Stream()
    for path in args.files:
        if path.lower().endswith((".sac",)):
            from volpick_tpu.core.sacio import read_sac

            stream.append(read_sac(path))
        else:
            from volpick_tpu.io import read_mseed

            stream += read_mseed(path)
    model, params = from_pretrained(args.model, args.weights)
    picker = WaveformPicker(model, params, precision=args.precision)
    kwargs = {}
    if args.overlap is not None:
        kwargs["overlap"] = args.overlap
    out = picker.classify(stream, blinding=tuple(args.blinding), batch_size=args.batch_size, **kwargs)
    if args.output:
        import csv

        with open(args.output, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["trace_id", "phase", "peak_time", "peak_value", "start_time", "end_time"])
            for p in out.picks:
                w.writerow([p.trace_id, p.phase, p.peak_time.isoformat(),
                            f"{p.peak_value:.4f}", p.start_time.isoformat(), p.end_time.isoformat()])
        print(f"{len(out.picks)} picks -> {args.output}")
    else:
        print(out)
        for p in out.picks:
            print(" ", p)
        for d in out.detections:
            print("  DET", d)


def _cmd_train(args):
    from volpick_tpu.train.trainer import main as train_main

    argv = ["--config", args.config]
    if args.test_run:
        argv.append("--test_run")
    return train_main(argv)


def _cmd_targets(args):
    from volpick_tpu.data import load_dataset
    from volpick_tpu.eval import generate_task0, generate_task1, generate_task23

    ds = load_dataset(args.data)
    generate_task0(ds, args.output, noise_before_events=True)
    generate_task1(ds, args.output, noise_before_events=True)
    generate_task23(ds, args.output)
    print(f"targets -> {args.output}")


def _cmd_evaluate(args):
    import volpick_tpu

    volpick_tpu.enable_compilation_cache()
    from volpick_tpu.data import load_dataset
    from volpick_tpu.eval import eval_task0, eval_tasks123, opt_prob_metrics, parse_task1, parse_task23
    from volpick_tpu.models import from_pretrained

    ds = load_dataset(args.data)
    model, params = from_pretrained(args.model, args.weights)
    eval_task0(model, params, ds, args.targets, args.output, batch_size=args.batch_size)
    eval_tasks123(model, params, ds, args.targets, args.output, batch_size=args.batch_size)
    stats = {}
    stats.update(opt_prob_metrics(args.output))
    stats.update(parse_task1(args.output))
    stats.update(parse_task23(args.output))
    print(json.dumps({k: (float(v) if hasattr(v, "item") else v) for k, v in stats.items()},
                     indent=2, default=str))


def _cmd_bench(args):
    import runpy

    runpy.run_module("bench", run_name="__main__")


def main(argv=None):
    ap = argparse.ArgumentParser(prog="volpick_tpu", description=__doc__,
                                 formatter_class=argparse.RawDescriptionHelpFormatter)
    sub = ap.add_subparsers(dest="command", required=True)

    p = sub.add_parser("pick", help="pick phases on waveform files")
    p.add_argument("files", nargs="+", help="miniSEED or SAC files")
    p.add_argument("--model", default="eqtransformer", choices=["phasenet", "eqtransformer", "voleqtransformer", "tpupicknet"])
    p.add_argument("--weights", default="volpick", help="pretrained weight name")
    p.add_argument("--overlap", type=int, default=None)
    p.add_argument("--blinding", type=int, nargs=2, default=(500, 500))
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--precision", default="float32", choices=["float32", "bfloat16"])
    p.add_argument("--output", "-o", help="write picks to CSV")
    p.set_defaults(fn=_cmd_pick)

    p = sub.add_parser("train", help="train from a JSON config")
    p.add_argument("--config", required=True)
    p.add_argument("--test_run", action="store_true")
    p.set_defaults(fn=_cmd_train)

    p = sub.add_parser("targets", help="generate evaluation target CSVs")
    p.add_argument("--data", required=True)
    p.add_argument("--output", required=True)
    p.set_defaults(fn=_cmd_targets)

    p = sub.add_parser("evaluate", help="run the evaluation harness")
    p.add_argument("--data", required=True)
    p.add_argument("--targets", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--model", default="phasenet")
    p.add_argument("--weights", default="volpick")
    p.add_argument("--batch-size", type=int, default=256)
    p.set_defaults(fn=_cmd_evaluate)

    p = sub.add_parser("bench", help="run the TPU benchmark")
    p.set_defaults(fn=_cmd_bench)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
