"""Plot TensorBoard scalar curves from one or more runs onto PNGs.

Usage:
    python tools/plot_curves.py out.png label1=dir1 [label2=dir2 ...] [--tags=a,b]

Default tags: train/PSNR, train/Homography_Error, train/loss_rgb.
"""

import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt


def load_scalars(run_dir):
    from tensorboard.backend.event_processing.event_accumulator import EventAccumulator

    ea = EventAccumulator(run_dir, size_guidance={"scalars": 0})
    ea.Reload()
    return {tag: ([s.step for s in ea.Scalars(tag)], [s.value for s in ea.Scalars(tag)]) for tag in ea.Tags()["scalars"]}


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    tags = "train/PSNR,train/Homography_Error,train/loss_rgb"
    for a in sys.argv[1:]:
        if a.startswith("--tags="):
            tags = a.split("=", 1)[1]
    tags = tags.split(",")
    out_png = args[0]
    runs = [(a.split("=", 1)[0], load_scalars(a.split("=", 1)[1])) for a in args[1:]]

    fig, axes = plt.subplots(1, len(tags), figsize=(5.5 * len(tags), 4))
    if len(tags) == 1:
        axes = [axes]
    for ax, tag in zip(axes, tags):
        for label, scalars in runs:
            if tag in scalars:
                steps, vals = scalars[tag]
                ax.plot(steps, vals, label=label, linewidth=1.4)
        ax.set_title(tag)
        ax.set_xlabel("iteration")
        if "loss" in tag:
            ax.set_yscale("log")
        ax.grid(alpha=0.3)
        ax.legend()
    fig.tight_layout()
    fig.savefig(out_png, dpi=110)
    print(f"wrote {out_png}")


if __name__ == "__main__":
    main()
