"""Entry-point shim: `python rope_visualizer.py ...` exactly like the
reference (/root/reference/rope_visualizer.py). The reference README also
refers to this tool as rope_frequency_visualizer.py; a matching shim exists
for that name too."""

from vit_rpe_rope_tpu.cli.rope_visualizer import main

if __name__ == "__main__":
    main()
