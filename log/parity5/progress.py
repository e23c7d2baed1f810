"""Latest test reward / env_step / measured steps-per-sec per parity5 run."""
import glob, os, time
os.environ["JAX_PLATFORMS"] = "cpu"
from tensorboard.backend.event_processing.event_accumulator import EventAccumulator
now = time.time()
for d in sorted(glob.glob("log/parity5/*/")):
    if not glob.glob(d + "**/events.*", recursive=True):
        continue
    acc = EventAccumulator(d, size_guidance={"scalars": 100000})
    acc.Reload()
    tags = acc.Tags()["scalars"]
    tag = next((t for t in tags if "test" in t and "reward" in t.lower() or t.endswith("test/returns_mean")), None)
    try:
        ev = acc.Scalars(tag)
        last, first = ev[-1], ev[0]
        best = max(e.value for e in ev)
        rate = (last.step - first.step) / max(last.wall_time - first.wall_time, 1)
        # recent rate over the last few evals
        recent = ev[-3] if len(ev) > 3 else first
        rrate = (last.step - recent.step) / max(last.wall_time - recent.wall_time, 1)
        eta = (1_000_000 - last.step) / max(rrate, 1e-9) / 3600
        print(f"{d.split('/')[-2]:28s} step={last.step:>8d} last={last.value:8.1f} "
              f"best={best:8.1f} rate={rate:5.0f}/s recent={rrate:5.0f}/s eta1M={eta:5.1f}h")
    except Exception as e:
        print(d, "err", e)
