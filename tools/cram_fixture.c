/* Test-only fixture generator: BAM -> CRAM via the REFERENCE's
 * vendored htslib (built out-of-tree by tools/build_reference_oracle.sh).
 * Used solely to produce golden CRAM inputs for the from-scratch CRAM
 * decoder in colate_tpu/native/hts.cpp; nothing here ships in the
 * framework.  Usage: cram_fixture in.bam ref.fa out.cram [version]
 * where version is e.g. "3.0" (default) or "2.1".
 */
#include <stdio.h>
#include <stdlib.h>
#include "htslib/sam.h"
#include "htslib/hfile.h"

int main(int argc, char** argv) {
  if (argc < 4) {
    fprintf(stderr, "usage: %s in.bam ref.fa out.cram [version]\n", argv[0]);
    return 2;
  }
  samFile* in = sam_open(argv[1], "r");
  if (!in) { perror("in"); return 1; }
  bam_hdr_t* hdr = sam_hdr_read(in);
  if (!hdr) { fprintf(stderr, "bad header\n"); return 1; }
  samFile* out = sam_open(argv[3], "wc");
  if (!out) { perror("out"); return 1; }
  if (argc > 4 && hts_set_opt(out, CRAM_OPT_VERSION, argv[4]) != 0) {
    fprintf(stderr, "CRAM_OPT_VERSION %s failed\n", argv[4]);
    return 1;
  }
  if (hts_set_fai_filename(out, argv[2]) != 0) {
    fprintf(stderr, "hts_set_fai_filename failed (need %s.fai?)\n", argv[2]);
    return 1;
  }
  if (sam_hdr_write(out, hdr) != 0) { fprintf(stderr, "hdr write\n"); return 1; }
  bam1_t* b = bam_init1();
  long n = 0;
  while (sam_read1(in, hdr, b) >= 0) {
    if (sam_write1(out, hdr, b) < 0) { fprintf(stderr, "rec write\n"); return 1; }
    n++;
  }
  bam_destroy1(b);
  sam_close(out);
  sam_close(in);
  fprintf(stderr, "wrote %ld records\n", n);
  return 0;
}
