"""Shared prune -> 5-task eval chaining for the blip2 launchers.

The reference launchers are prune+eval pipelines, not just prunes:
``scripts/blip2/ecoflap_zeroth.py:38-56`` re-invokes evaluate_blip.py on
vqav2/gqa/okvqa/nocaps/ret_flickr with the pruned checkpoint after the prune
leg finishes. This module reproduces that composition: one subprocess per
leg (the reference also shells out per stage; a fresh process per leg also
resets the axon cumulative-allocation budget), the prune leg emits the
reference-contract .pth via --save_pruned_model, and each eval leg loads it
through ``cli.evaluate --checkpoint`` + the shipped project YAML.
"""

import json
import os
import subprocess
import sys

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..")

# the reference's post-prune eval loop (ecoflap_zeroth.py:38)
EVAL_TASKS = [
    "vqav2_zeroshot_flant5xl_eval",
    "gqa_zeroshot_flant5xl_eval",
    "okvqa_zeroshot_flant5xl_eval",
    "nocaps_flant5xl_eval",
    "ret_flickr_eval",
]

# flags meaningful to BOTH legs; everything else goes to the prune leg only
_SHARED_VALUE_FLAGS = ("--model_scale", "--platform", "--output_dir")
_SHARED_BOOL_FLAGS = ("--synthetic",)


def _split_args(argv):
    """(prune_extra, eval_extra, eval_tasks, chain) from the launcher CLI."""
    prune, shared = [], []
    tasks = list(EVAL_TASKS)
    chain = True
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--no_eval":
            chain = False
        elif a == "--eval_tasks":
            tasks = [t for t in argv[i + 1].split(",") if t]
            i += 1
        elif a in _SHARED_VALUE_FLAGS:
            shared += [a, argv[i + 1]]
            prune += [a, argv[i + 1]]
            i += 1
        elif a in _SHARED_BOOL_FLAGS:
            shared.append(a)
        else:
            prune.append(a)
        i += 1
    return prune, shared, tasks, chain


def _run_leg(cmd):
    """Run one leg, tee stderr, return (rc, last-JSON-line dict or None)."""
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    res = subprocess.run(cmd, env=env, stdout=subprocess.PIPE, text=True)
    sys.stdout.write(res.stdout)
    sys.stdout.flush()
    out = None
    for line in reversed(res.stdout.strip().splitlines() or [""]):
        try:
            out = json.loads(line)
            break
        except ValueError:
            continue
    return res.returncode, out


def run(prune_args, argv=None):
    """Prune with ``prune_args`` (+ launcher CLI extras), then chain the
    reference's 5 eval configs on the pruned .pth. ``--no_eval`` restores
    the prune-only behavior; ``--eval_tasks a,b`` restricts the loop."""
    prune_extra, shared, tasks, chain = _split_args(list(argv or []))
    prune_cmd = ([sys.executable, "-m", "ecoflap_tpu.cli.prune"]
                 + prune_args + prune_extra)
    if chain and "--save_pruned_model" not in prune_cmd:
        prune_cmd.append("--save_pruned_model")
    rc, result = _run_leg(prune_cmd)
    if rc != 0:
        raise SystemExit(rc)
    if not chain:
        return result
    pth = (result or {}).get("pth")
    if not pth:
        raise SystemExit("prune leg produced no .pth (missing "
                         "--save_pruned_model artifact in its result)")
    # tiny/small prune legs need the eval YAML's model_scale overridden to
    # match the checkpoint shapes (explicit flag > YAML, core/project.py)
    results = {"prune": result}
    for task in tasks:
        cmd = ([sys.executable, "-m", "ecoflap_tpu.cli.evaluate",
                "--cfg-path", f"blip2/eval/{task}.yaml",
                "--checkpoint", pth] + shared)
        print(f"[chain] eval {task}", file=sys.stderr, flush=True)
        rc, metrics = _run_leg(cmd)
        results[task] = metrics if rc == 0 else {"error": rc}
    print(json.dumps({"chained": results}))
    return results
