"""Export a TensorBoard event directory to metrics.jsonl (one line per
step with all scalar tags present at that step) — the committed-artifact
format of the training runs.

Usage: python scripts/tb_to_jsonl.py TB_DIR [OUT_JSONL]
"""

import json
import os
import sys

from tensorboard.backend.event_processing import event_accumulator


def main():
    tb_dir = sys.argv[1]
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        tb_dir, "metrics.jsonl")
    acc = event_accumulator.EventAccumulator(
        tb_dir, size_guidance={event_accumulator.SCALARS: 0})
    acc.Reload()
    rows = {}
    for tag in acc.Tags()["scalars"]:
        for ev in acc.Scalars(tag):
            rows.setdefault(ev.step, {})[tag] = ev.value
    with open(out, "w") as f:
        for step in sorted(rows):
            f.write(json.dumps({"update": step, **rows[step]}) + "\n")
    print(f"wrote {out}: {len(rows)} steps, "
          f"{len(acc.Tags()['scalars'])} tags")


if __name__ == "__main__":
    main()
