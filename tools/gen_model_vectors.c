/* Golden vectors for non-default kernel models: build the reference with
   overridden KERNEL_RADIUS/KERNEL_RESOLUTION and dump table + one-shot
   resample outputs. Compiled twice with different -D flags. */
#define CLOWNRESAMPLER_IMPLEMENTATION
#define CLOWNRESAMPLER_STATIC
#include "clownresampler.h"
#include <stdio.h>
#include <stdlib.h>

static unsigned int rs = 0x2468ACE0u;
static unsigned int rng(void){unsigned x=rs;x^=x<<13;x^=x>>17;x^=x<<5;rs=x;return x;}

int main(int argc, char **argv){
    static ClownResampler_Precomputed pre;
    ClownResampler_LowLevel_State st;
    size_t i, n = 400, total;
    cc_s16l *buf;
    FILE *f;
    size_t radius;
    ClownResampler_Precompute(&pre);
    f = fopen(argv[1], "wb");
    for (i = 0; i < CLOWNRESAMPLER_COUNT_OF(pre.lanczos_kernel_table); ++i){
        int v = (int)pre.lanczos_kernel_table[i];
        fwrite(&v, 4, 1, f);
    }
    fclose(f);
    /* one-shot 44100->32000 stereo resample, radius-padded */
    ClownResampler_LowLevel_Init(&st, 2, 44100, 32000, 44100);
    radius = st.lowest_level.integer_stretched_kernel_radius;
    total = n + 2*radius;
    buf = calloc(total*2, sizeof(cc_s16l));
    for (i = 0; i < n*2; ++i) buf[(radius)*2 + i] = (cc_s16l)(short)(rng() & 0xFFFF);
    f = fopen(argv[2], "wb");
    fwrite(buf, sizeof(cc_s16l), total*2, f);
    fclose(f);
    {
        FILE *out = fopen(argv[3], "wb");
        size_t in_frames = n;
        /* write each emitted frame's samples as i64 */
        struct Sink { FILE *f; } sink;
        /* inline callback via static file pointer */
        extern int unused;
        /* use a simple static */
        static FILE *g_out;
        g_out = out;
        {
            cc_bool cb(void *ud, const cc_s32f *frame, cc_u8f ns){
                long long v; cc_u8f k;
                for (k = 0; k < ns; ++k){ v = (long long)frame[k]; fwrite(&v, 8, 1, g_out);}
                return cc_true;
            }
            ClownResampler_LowLevel_Resample(&st, &pre, buf, &in_frames, cb, NULL);
        }
        fclose(out);
    }
    fprintf(stderr, "radius=%d resolution=%d stretched_radius=%d\n",
            CLOWNRESAMPLER_KERNEL_RADIUS, CLOWNRESAMPLER_KERNEL_RESOLUTION, (int)radius);
    return 0;
}
