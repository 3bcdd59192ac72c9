/* Naive separable DCT implementation of the minimal FFTW3f API (see
 * include/fftw3.h).  Correctness over speed: O(n^2) per 1-D transform with
 * double accumulation; cosine tables cached per plan.  Sufficient to run
 * the 8x8-patch DCTs of the C reference and its whole-image multiscaler
 * transforms for golden-fixture generation. */

#include <math.h>
#include <stdlib.h>
#include <string.h>
#include "include/fftw3.h"

struct fftwf_plan_s {
    int rank;
    int n[3];
    int howmany;
    int istride, idist, ostride, odist;
    fftwf_r2r_kind kind[3];
    float *in, *out;
    double *tab[3]; /* cosine matrix per dimension: tab[d][k*n+j] */
};

static double *make_table(int n, fftwf_r2r_kind kind)
{
    double *t = malloc(sizeof(double) * (size_t)n * n);
    for (int k = 0; k < n; k++)
        for (int j = 0; j < n; j++) {
            if (kind == FFTW_REDFT10)
                /* X_k = 2 sum_j x_j cos(pi (2j+1) k / (2n)) */
                t[k * n + j] = 2.0 * cos(M_PI * (2.0 * j + 1.0) * k / (2.0 * n));
            else /* FFTW_REDFT01: X_j = x_0 + 2 sum_{k>=1} x_k cos(...) */
                t[j * n + k] = (k == 0)
                    ? 1.0
                    : 2.0 * cos(M_PI * k * (2.0 * j + 1.0) / (2.0 * n));
        }
    return t;
}

fftwf_plan fftwf_plan_many_r2r(int rank, const int *n, int howmany,
                               float *in, const int *inembed,
                               int istride, int idist,
                               float *out, const int *onembed,
                               int ostride, int odist,
                               const fftwf_r2r_kind *kind, unsigned flags)
{
    (void)inembed; (void)onembed; (void)flags;
    fftwf_plan p = calloc(1, sizeof(*p));
    p->rank = rank;
    p->howmany = howmany;
    p->istride = istride; p->idist = idist;
    p->ostride = ostride; p->odist = odist;
    p->in = in; p->out = out;
    for (int d = 0; d < rank; d++) {
        p->n[d] = n[d];
        p->kind[d] = kind[d];
        p->tab[d] = make_table(n[d], kind[d]);
    }
    return p;
}

fftwf_plan fftwf_plan_r2r_2d(int n0, int n1, float *in, float *out,
                             fftwf_r2r_kind kind0, fftwf_r2r_kind kind1,
                             unsigned flags)
{
    int n[2] = { n0, n1 };
    fftwf_r2r_kind k[2] = { kind0, kind1 };
    return fftwf_plan_many_r2r(2, n, 1, in, NULL, 1, n0 * n1,
                               out, NULL, 1, n0 * n1, k, flags);
}

/* apply the 1-D transform of dimension d along its axis, in place on buf
 * (one signal, contiguous row-major layout n[0] x n[1] x ... ) */
static void apply_dim(const fftwf_plan p, int d, double *buf)
{
    int nd = p->n[d];
    /* strides in the contiguous row-major signal */
    int stride = 1;
    for (int e = d + 1; e < p->rank; e++) stride *= p->n[e];
    int total = 1;
    for (int e = 0; e < p->rank; e++) total *= p->n[e];
    int nlines = total / nd;

    double *line = malloc(sizeof(double) * nd);
    for (int l = 0; l < nlines; l++) {
        /* compute base offset of line l: iterate all dims except d */
        int rem = l, base = 0, mul = 1;
        for (int e = p->rank - 1; e >= 0; e--) {
            if (e == d) { mul *= nd; continue; }
            int sz = p->n[e];
            int idx = rem % sz;
            rem /= sz;
            /* stride of dim e */
            int se = 1;
            for (int f2 = e + 1; f2 < p->rank; f2++) se *= p->n[f2];
            base += idx * se;
        }
        (void)mul;
        for (int j = 0; j < nd; j++) line[j] = buf[base + j * stride];
        const double *tab = p->tab[d];
        for (int k = 0; k < nd; k++) {
            double acc = 0.0;
            for (int j = 0; j < nd; j++) acc += tab[k * nd + j] * line[j];
            buf[base + k * stride] = acc;
        }
    }
    free(line);
}

void fftwf_execute_r2r(const fftwf_plan p, float *in, float *out)
{
    int total = 1;
    for (int e = 0; e < p->rank; e++) total *= p->n[e];
    double *buf = malloc(sizeof(double) * total);
    for (int s = 0; s < p->howmany; s++) {
        for (int i = 0; i < total; i++)
            buf[i] = in[(size_t)s * p->idist + (size_t)i * p->istride];
        for (int d = 0; d < p->rank; d++) apply_dim(p, d, buf);
        for (int i = 0; i < total; i++)
            out[(size_t)s * p->odist + (size_t)i * p->ostride] = (float)buf[i];
    }
    free(buf);
}

void fftwf_execute(const fftwf_plan p) { fftwf_execute_r2r(p, p->in, p->out); }

void fftwf_destroy_plan(fftwf_plan p)
{
    if (!p) return;
    for (int d = 0; d < p->rank; d++) free(p->tab[d]);
    free(p);
}

void *fftwf_malloc(size_t n) { return malloc(n); }
void fftwf_free(void *p) { free(p); }
void fftwf_cleanup(void) {}
