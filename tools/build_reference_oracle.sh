#!/bin/bash
# Build the reference Colate/CoalRate binaries (the golden-test oracle)
# out-of-tree into /tmp/refbin.  The reference source at /root/reference is
# read-only and its config.h targets macOS; we copy to /tmp, switch off
# CommonCrypto/libcurl/S3/GCS/bz2 (absent here), and compile directly.
# NOTHING from the reference is copied into this repository.
set -e
SRCRO=${1:-/root/reference}
WORK=/tmp/refsrc
OUT=/tmp/refbin
[ -x $OUT/Colate ] && { echo "oracle already built at $OUT"; exit 0; }
mkdir -p $WORK $OUT/obj
cp -r $SRCRO/include $WORK/ 2>/dev/null || true
chmod -R u+w $WORK
python3 - <<'PYEOF'
p = '/tmp/refsrc/include/vcf/config.h'
s = open(p).read()
for a, b in [('#define ENABLE_GCS 1', '/* #undef ENABLE_GCS */'),
             ('#define ENABLE_S3 1', '/* #undef ENABLE_S3 */'),
             ('#define HAVE_COMMONCRYPTO 1', '/* #undef HAVE_COMMONCRYPTO */'),
             ('#define HAVE_LIBCURL 1', '/* #undef HAVE_LIBCURL */'),
             ('#define HAVE_LIBBZ2 1', '/* #undef HAVE_LIBBZ2 */')]:
    s = s.replace(a, b)
open(p, 'w').write(s)
PYEOF
cat > $WORK/include/vcf/bzlib.h <<'HEOF'
#ifndef STUB_BZLIB_H
#define STUB_BZLIB_H
/* stub: system bzlib is absent; HAVE_LIBBZ2 is undefined so no symbol is used */
#define BZ_OK 0
#define BZ_RUN 0
#define BZ_FINISH 2
#define BZ_STREAM_END 4
typedef struct { char *next_in; unsigned avail_in; unsigned total_in_lo32, total_in_hi32;
 char *next_out; unsigned avail_out; unsigned total_out_lo32, total_out_hi32;
 void *state; void *(*bzalloc)(void *,int,int); void (*bzfree)(void *,void *); void *opaque; } bz_stream;
static inline int BZ2_bzBuffToBuffCompress(char*d,unsigned*dl,char*s,unsigned sl,int a,int b,int c){(void)d;(void)dl;(void)s;(void)sl;(void)a;(void)b;(void)c;return -1;}
static inline int BZ2_bzBuffToBuffDecompress(char*d,unsigned*dl,char*s,unsigned sl,int a,int b){(void)d;(void)dl;(void)s;(void)sl;(void)a;(void)b;return -1;}
#endif
HEOF
SRC=$WORK/include
CFLAGS="-O2 -I$SRC/vcf -I$SRC/vcf/htslib -w"
CXXFLAGS="-O2 -std=c++14 -I$SRC/src -I$SRC/src/gzstream -I$SRC/vcf -I$SRC/coal -w"
HTS_C="bcf_sr_sort bgzf errmod faidx header hfile hfile_net hts hts_os kfunc knetfile kstring md5 multipart probaln realn regidx region sam synced_bcf_reader tbx textutils thread_pool vcf vcf_sweep vcfutils"
CRAM_C="cram_codecs cram_decode cram_encode cram_external cram_index cram_io cram_samtools cram_stats mFILE open_trace_file pooled_alloc rANS_static string_alloc"
cd $OUT/obj
for f in $HTS_C; do gcc $CFLAGS -c $SRC/vcf/$f.c -o $f.o & done
for f in $CRAM_C; do gcc $CFLAGS -I$SRC/vcf/cram -c $SRC/vcf/cram/$f.c -o cram_$f.o & done
wait
g++ $CXXFLAGS -c $SRC/src/gzstream/gzstream.cpp -o gzstream.o &
for f in anc mutations data sample; do g++ $CXXFLAGS -c $SRC/src/$f.cpp -o $f.o & done
g++ $CXXFLAGS -c $SRC/vcf/htslib.cpp -o htslib_wrap.o &
for f in coal_EM coal_EM_old coal_tree; do g++ $CXXFLAGS -c $SRC/coal/$f.cpp -o $f.o & done
g++ $CXXFLAGS -c $SRC/coal/Colate.cpp -o Colate.o &
g++ $CXXFLAGS -c $SRC/coal/CoalRate.cpp -o CoalRate.o &
wait
OBJS="coal_EM.o coal_EM_old.o coal_tree.o htslib_wrap.o anc.o mutations.o data.o sample.o gzstream.o $(for f in $HTS_C; do echo $f.o; done) $(for f in $CRAM_C; do echo cram_$f.o; done)"
g++ -O2 Colate.o $OBJS -o $OUT/Colate -lz -llzma -lm -lpthread
g++ -O2 CoalRate.o $OBJS -o $OUT/CoalRate -lz -llzma -lm -lpthread
echo "oracle built: $OUT/Colate $OUT/CoalRate"
