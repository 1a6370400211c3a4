"""Alias shim: the reference README (README.md:72,84) documents this tool as
rope_frequency_visualizer.py while the actual file is rope_visualizer.py —
we provide both names."""

from vit_rpe_rope_tpu.cli.rope_visualizer import main

if __name__ == "__main__":
    main()
