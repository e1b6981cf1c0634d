/* bam2cram — dev-time fixture generator for the pure-Python CRAM reader.
 *
 * Converts a BAM to CRAM (3.0) with htslib-1.9 (compiled from the read-only
 * reference tarball) and builds the .crai index.  The committed fixtures under
 * tests/data/cram/ were produced by this tool; tests decode them with
 * paragraph_tpu.io.cram and compare field-by-field against the same records
 * decoded from the source BAM with paragraph_tpu.io.bam.
 *
 * Usage: bam2cram in.bam ref.fa out.cram [seqs_per_slice [mode]]
 *   mode: 0 = reference-based (default), 1 = no-ref, 2 = embedded ref
 *
 * Build:
 *   gcc -O2 -I/tmp/htslib-1.9 tests/tools/bam2cram.c \
 *       /tmp/htslib-1.9/libhts.a -lz -lbz2 -llzma -lpthread -lm -o /tmp/bam2cram
 */
#include <stdio.h>
#include <stdlib.h>
#include "htslib/sam.h"
#include "htslib/hts.h"

int main(int argc, char **argv)
{
    if (argc < 4) {
        fprintf(stderr, "usage: %s in.bam ref.fa out.cram [seqs_per_slice [mode]]\n", argv[0]);
        return 1;
    }
    const char *in_path = argv[1], *ref = argv[2], *out_path = argv[3];
    int seqs_per_slice = argc > 4 ? atoi(argv[4]) : 0;
    int mode = argc > 5 ? atoi(argv[5]) : 0;

    samFile *in = sam_open(in_path, "r");
    if (!in) { perror("sam_open in"); return 1; }
    bam_hdr_t *hdr = sam_hdr_read(in);
    samFile *out = sam_open(out_path, "wc");
    if (!out) { perror("sam_open out"); return 1; }
    if (hts_set_opt(out, CRAM_OPT_REFERENCE, ref) != 0) return 1;
    if (seqs_per_slice > 0) {
        hts_set_opt(out, CRAM_OPT_SEQS_PER_SLICE, seqs_per_slice);
        hts_set_opt(out, CRAM_OPT_SLICES_PER_CONTAINER, 1);
    }
    if (mode == 1) hts_set_opt(out, CRAM_OPT_NO_REF, 1);
    if (mode == 2) hts_set_opt(out, CRAM_OPT_EMBED_REF, 1);
    if (sam_hdr_write(out, hdr) != 0) return 1;

    bam1_t *b = bam_init1();
    long n = 0;
    while (sam_read1(in, hdr, b) >= 0) {
        if (sam_write1(out, hdr, b) < 0) { fprintf(stderr, "write fail\n"); return 1; }
        n++;
    }
    bam_destroy1(b);
    sam_close(out);
    sam_close(in);
    if (sam_index_build(out_path, 0) != 0) { fprintf(stderr, "index fail\n"); return 1; }
    fprintf(stderr, "%s: %ld records\n", out_path, n);
    bam_hdr_destroy(hdr);
    return 0;
}
