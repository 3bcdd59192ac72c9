"""Command-line tools mirroring the reference binaries and scripts.

| module             | mirrors                              |
|--------------------|--------------------------------------|
| nlkalman_flt       | nlkalman-flt (src/main-flt.c)        |
| nlkalman_smo       | nlkalman-smo (src/main-smo.c)        |
| tvl1flow           | tvl1flow (lib/tvl1flow/main.c)       |
| nlkalman_seq       | scripts/nlkalman-seq.sh + -gt.sh     |
| msnlkalman_seq     | scripts/msnlkalman-seq.sh + -gt.sh   |
| msnlkalman_lz3_seq | scripts/msnlkalman-lz3-seq.sh + -gt  |
| iion               | iion (lib/imscript-lite/src/iion.c)  |
| awgn               | awgn (lib/imscript-lite)             |
| psnr               | scripts/psnr.sh                      |
| decompose          | decompose (lib/multiscale)           |
| recompose          | recompose (lib/multiscale)           |

Run as `python -m bwd_nlkalman_tpu.cli.<tool> ...`.
"""
