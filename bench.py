"""Headline benchmark entry point. Prints ONE JSON line to stdout.

Thin wrapper over music_style_transfer_ldm_tpu.benchmarks so the packaged
`mstldm bench` and the repo-root driver invocation share one implementation.
"""

from music_style_transfer_ldm_tpu.benchmarks import main

if __name__ == "__main__":
    main()
