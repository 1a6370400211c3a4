"""Entry-point shim: `python pe_similarity_visualizer.py ...` exactly like
the reference (/root/reference/pe_similarity_visualizer.py)."""

from vit_rpe_rope_tpu.cli.pe_similarity_visualizer import main

if __name__ == "__main__":
    main()
