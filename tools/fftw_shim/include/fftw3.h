/* Minimal FFTW3 single-precision API shim — just enough to build the
 * bwd-nlkalman C reference for golden-output generation in environments
 * without FFTW.  Implements separable REDFT10/REDFT01 (DCT-II/III) via
 * naive matrix products; bit-exact FFTW unnormalized conventions:
 *   REDFT10:  X_k = 2 sum_j x_j cos(pi (2j+1) k / (2n))
 *   REDFT01:  X_j = x_0 + 2 sum_{k>=1} x_k cos(pi k (2j+1) / (2n))
 * Not derived from FFTW source; written from the documented definitions.
 */
#ifndef FFTW_SHIM_H
#define FFTW_SHIM_H

#include <stddef.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef enum {
    FFTW_R2HC = 0, FFTW_HC2R = 1, FFTW_DHT = 2,
    FFTW_REDFT00 = 3, FFTW_REDFT01 = 4, FFTW_REDFT10 = 5, FFTW_REDFT11 = 6,
    FFTW_RODFT00 = 7, FFTW_RODFT01 = 8, FFTW_RODFT10 = 9, FFTW_RODFT11 = 10
} fftwf_r2r_kind;

#define FFTW_ESTIMATE (1U << 6)
#define FFTW_MEASURE  (0U)

typedef struct fftwf_plan_s *fftwf_plan;

fftwf_plan fftwf_plan_many_r2r(int rank, const int *n, int howmany,
                               float *in, const int *inembed,
                               int istride, int idist,
                               float *out, const int *onembed,
                               int ostride, int odist,
                               const fftwf_r2r_kind *kind, unsigned flags);

fftwf_plan fftwf_plan_r2r_2d(int n0, int n1, float *in, float *out,
                             fftwf_r2r_kind kind0, fftwf_r2r_kind kind1,
                             unsigned flags);

void fftwf_execute(const fftwf_plan p);
void fftwf_execute_r2r(const fftwf_plan p, float *in, float *out);
void fftwf_destroy_plan(fftwf_plan p);
void *fftwf_malloc(size_t n);
void fftwf_free(void *p);
void fftwf_cleanup(void);

#ifdef __cplusplus
}
#endif

#endif
