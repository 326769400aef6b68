/* Multicore CPU Pippenger MSM over BLS12-381 G1.
 *
 * This is the framework's honest CPU reference for the MSM north-star
 * metric (BASELINE.md: "beat multicore CPU reference") — the role the
 * consumed crypto3-zk / bellperson CPU prover plays for the reference
 * (SURVEY.md §2.9 P5). Plain portable C (unsigned __int128 Montgomery
 * CIOS), pthreads across Pippenger windows. It doubles as an
 * independent correctness cross-check for the TPU kernels.
 *
 * Wire formats (all little-endian plain form, not Montgomery):
 *   affine point: 96 B  (x 48 | y 48); x==y==0 means infinity
 *   scalar:       32 B
 *   result:       144 B Jacobian (X 48 | Y 48 | Z 48); Z==0 infinity
 */
#include <pthread.h>
#include <stdint.h>
#include <stdlib.h>
#include <string.h>

typedef uint64_t fq[6];
typedef unsigned __int128 u128;

static const fq P = {0xb9feffffffffaaabULL, 0x1eabfffeb153ffffULL,
                     0x6730d2a0f6b0f624ULL, 0x64774b84f38512bfULL,
                     0x4b1ba7b6434bacd7ULL, 0x1a0111ea397fe69aULL};
static const uint64_t INV = 0x89f3fffcfffcfffdULL;
static const fq FQ_ONE = {0x760900000002fffdULL, 0xebf4000bc40c0002ULL,
                          0x5f48985753c758baULL, 0x77ce585370525745ULL,
                          0x5c071a97a256ec6dULL, 0x15f65ec3fa80e493ULL};
static const fq R2 = {0xf4df1f341c341746ULL, 0x0a76e6a609d104f1ULL,
                      0x8de5476c4c95b6d5ULL, 0x67eb88a9939d83c0ULL,
                      0x9a793e85b519952dULL, 0x11988fe592cae3aaULL};

static inline int fq_is_zero(const fq a) {
  return (a[0] | a[1] | a[2] | a[3] | a[4] | a[5]) == 0;
}

static inline int fq_geq_p(const fq a) {
  for (int i = 5; i >= 0; i--) {
    if (a[i] < P[i]) return 0;
    if (a[i] > P[i]) return 1;
  }
  return 1;
}

static inline void fq_sub_p(fq a) {
  u128 borrow = 0;
  for (int i = 0; i < 6; i++) {
    u128 d = (u128)a[i] - P[i] - borrow;
    a[i] = (uint64_t)d;
    borrow = (d >> 64) & 1;
  }
}

static inline void fq_add(fq out, const fq a, const fq b) {
  u128 carry = 0;
  for (int i = 0; i < 6; i++) {
    u128 s = (u128)a[i] + b[i] + carry;
    out[i] = (uint64_t)s;
    carry = s >> 64;
  }
  if (carry || fq_geq_p(out)) fq_sub_p(out);
}

static inline void fq_sub(fq out, const fq a, const fq b) {
  u128 borrow = 0;
  for (int i = 0; i < 6; i++) {
    u128 d = (u128)a[i] - b[i] - borrow;
    out[i] = (uint64_t)d;
    borrow = (d >> 64) & 1;
  }
  if (borrow) { /* += p */
    u128 carry = 0;
    for (int i = 0; i < 6; i++) {
      u128 s = (u128)out[i] + P[i] + carry;
      out[i] = (uint64_t)s;
      carry = s >> 64;
    }
  }
}

static inline void fq_dbl(fq out, const fq a) { fq_add(out, a, a); }

/* Montgomery CIOS multiply: out = a*b*R^-1 mod p */
static void fq_mul(fq out, const fq a, const fq b) {
  uint64_t t[8] = {0};
  for (int i = 0; i < 6; i++) {
    u128 carry = 0;
    for (int j = 0; j < 6; j++) {
      u128 s = (u128)t[j] + (u128)a[j] * b[i] + carry;
      t[j] = (uint64_t)s;
      carry = s >> 64;
    }
    u128 s = (u128)t[6] + carry;
    t[6] = (uint64_t)s;
    t[7] = (uint64_t)(s >> 64);

    uint64_t m = t[0] * INV;
    carry = ((u128)t[0] + (u128)m * P[0]) >> 64;
    for (int j = 1; j < 6; j++) {
      u128 s2 = (u128)t[j] + (u128)m * P[j] + carry;
      t[j - 1] = (uint64_t)s2;
      carry = s2 >> 64;
    }
    s = (u128)t[6] + carry;
    t[5] = (uint64_t)s;
    t[6] = t[7] + (uint64_t)(s >> 64);
    t[7] = 0;
  }
  memcpy(out, t, 48);
  if (t[6] || fq_geq_p(out)) fq_sub_p(out);
}

static inline void fq_sqr(fq out, const fq a) { fq_mul(out, a, a); }

/* ---- G1 Jacobian (Montgomery coordinates) ---- */

typedef struct {
  fq X, Y, Z;
} g1;

static const g1 G1_ZERO; /* Z == 0 */

static inline int g1_is_inf(const g1 *p) { return fq_is_zero(p->Z); }

static void g1_dbl(g1 *out, const g1 *p) {
  if (g1_is_inf(p)) {
    *out = *p;
    return;
  }
  fq A, B, C, D, E, F, t;
  fq_sqr(A, p->X);
  fq_sqr(B, p->Y);
  fq_sqr(C, B);
  /* D = 2*((X+B)^2 - A - C) */
  fq_add(t, p->X, B);
  fq_sqr(D, t);
  fq_sub(D, D, A);
  fq_sub(D, D, C);
  fq_dbl(D, D);
  /* E = 3A, F = E^2 */
  fq_dbl(E, A);
  fq_add(E, E, A);
  fq_sqr(F, E);
  g1 r;
  fq_sub(r.X, F, D);
  fq_sub(r.X, r.X, D);
  fq_dbl(t, C);
  fq_dbl(t, t);
  fq_dbl(t, t); /* 8C */
  fq_sub(r.Y, D, r.X);
  fq_mul(r.Y, r.Y, E);
  fq_sub(r.Y, r.Y, t);
  fq_mul(r.Z, p->Y, p->Z);
  fq_dbl(r.Z, r.Z);
  *out = r;
}

/* out = p + (x2, y2) with (x2,y2) affine, Montgomery form (madd-2007-bl) */
static void g1_madd(g1 *out, const g1 *p, const fq x2, const fq y2) {
  if (g1_is_inf(p)) {
    memcpy(out->X, x2, 48);
    memcpy(out->Y, y2, 48);
    memcpy(out->Z, FQ_ONE, 48);
    return;
  }
  fq Z1Z1, U2, S2, H, HH, I, J, r, V, t;
  fq_sqr(Z1Z1, p->Z);
  fq_mul(U2, x2, Z1Z1);
  fq_mul(S2, y2, p->Z);
  fq_mul(S2, S2, Z1Z1);
  fq_sub(H, U2, p->X);
  fq_sub(r, S2, p->Y);
  if (fq_is_zero(H)) {
    if (fq_is_zero(r)) {
      g1_dbl(out, p);
      return;
    }
    *out = G1_ZERO;
    return;
  }
  fq_dbl(r, r);
  fq_sqr(HH, H);
  fq_dbl(I, HH);
  fq_dbl(I, I);
  fq_mul(J, H, I);
  fq_mul(V, p->X, I);
  g1 o;
  fq_sqr(o.X, r);
  fq_sub(o.X, o.X, J);
  fq_sub(o.X, o.X, V);
  fq_sub(o.X, o.X, V);
  fq_sub(t, V, o.X);
  fq_mul(o.Y, r, t);
  fq_mul(t, p->Y, J);
  fq_dbl(t, t);
  fq_sub(o.Y, o.Y, t);
  fq_add(t, p->Z, H);
  fq_sqr(o.Z, t);
  fq_sub(o.Z, o.Z, Z1Z1);
  fq_sub(o.Z, o.Z, HH);
  *out = o;
}

/* general Jacobian add (add-2007-bl) */
static void g1_add(g1 *out, const g1 *p, const g1 *q) {
  if (g1_is_inf(p)) {
    *out = *q;
    return;
  }
  if (g1_is_inf(q)) {
    *out = *p;
    return;
  }
  fq Z1Z1, Z2Z2, U1, U2, S1, S2, H, I, J, r, V, t;
  fq_sqr(Z1Z1, p->Z);
  fq_sqr(Z2Z2, q->Z);
  fq_mul(U1, p->X, Z2Z2);
  fq_mul(U2, q->X, Z1Z1);
  fq_mul(S1, p->Y, q->Z);
  fq_mul(S1, S1, Z2Z2);
  fq_mul(S2, q->Y, p->Z);
  fq_mul(S2, S2, Z1Z1);
  fq_sub(H, U2, U1);
  fq_sub(r, S2, S1);
  if (fq_is_zero(H)) {
    if (fq_is_zero(r)) {
      g1_dbl(out, p);
      return;
    }
    *out = G1_ZERO;
    return;
  }
  fq_dbl(r, r);
  fq_dbl(t, H);
  fq_sqr(I, t);
  fq_mul(J, H, I);
  fq_mul(V, U1, I);
  g1 o;
  fq_sqr(o.X, r);
  fq_sub(o.X, o.X, J);
  fq_sub(o.X, o.X, V);
  fq_sub(o.X, o.X, V);
  fq_sub(t, V, o.X);
  fq_mul(o.Y, r, t);
  fq_mul(t, S1, J);
  fq_dbl(t, t);
  fq_sub(o.Y, o.Y, t);
  fq_add(t, p->Z, q->Z);
  fq_sqr(o.Z, t);
  fq_sub(o.Z, o.Z, Z1Z1);
  fq_sub(o.Z, o.Z, Z2Z2);
  fq_mul(o.Z, o.Z, H);
  *out = o;
}

/* ---- Pippenger ---- */

typedef struct {
  const fq *xs;     /* Montgomery affine x, per point */
  const fq *ys;     /* Montgomery affine y */
  const uint8_t *valid;
  const uint8_t *scalars; /* 32 B LE each */
  uint64_t n;
  int c;          /* window bits */
  int w_begin, w_end;
  g1 *window_out; /* one total per window */
} task_t;

static inline uint32_t digit_of(const uint8_t *s, int w, int c) {
  int bit = w * c;
  int byte = bit >> 3, off = bit & 7;
  /* read 8 bytes (scalar buffer padded to 40 B by caller's layout: we
     copy into a 40-byte local to stay in bounds) */
  uint64_t chunk = 0;
  for (int i = 0; i < 8 && byte + i < 32; i++)
    chunk |= (uint64_t)s[byte + i] << (8 * i);
  return (uint32_t)((chunk >> off) & ((1u << c) - 1));
}

static void *window_worker(void *arg) {
  task_t *t = (task_t *)arg;
  int nb = 1 << t->c;
  g1 *buckets = (g1 *)calloc(nb, sizeof(g1));
  for (int w = t->w_begin; w < t->w_end; w++) {
    memset(buckets, 0, (size_t)nb * sizeof(g1));
    for (uint64_t i = 0; i < t->n; i++) {
      if (t->valid && !t->valid[i]) continue;
      uint32_t d = digit_of(t->scalars + 32 * i, w, t->c);
      if (d) g1_madd(&buckets[d], &buckets[d], t->xs[i], t->ys[i]);
    }
    /* sum_b b * S_b via running suffix sums */
    g1 run = G1_ZERO, tot = G1_ZERO;
    for (int b = nb - 1; b >= 1; b--) {
      g1_add(&run, &run, &buckets[b]);
      g1_add(&tot, &tot, &run);
    }
    t->window_out[w] = tot;
  }
  free(buckets);
  return NULL;
}

/* points: n*96 B plain LE affine; scalars: n*32 B LE.
 * out: 144 B plain LE Jacobian. */
void msm_g1_cpu(const uint8_t *points, const uint8_t *scalars, uint64_t n,
                int c, int n_threads, uint8_t *out) {
  if (c <= 0) { /* auto: ~log2(n) - 3, clamped */
    int l = 0;
    for (uint64_t v = n; v > 1; v >>= 1) l++;
    c = l - 3;
    if (c < 4) c = 4;
    if (c > 16) c = 16;
  }
  int W = (255 + c - 1) / c;
  if (n_threads <= 0) n_threads = 4;
  if (n_threads > W) n_threads = W;

  /* stage points into Montgomery form once */
  fq *xs = (fq *)malloc(n * sizeof(fq));
  fq *ys = (fq *)malloc(n * sizeof(fq));
  uint8_t *valid = (uint8_t *)malloc(n);
  for (uint64_t i = 0; i < n; i++) {
    fq x, y;
    memcpy(x, points + 96 * i, 48);
    memcpy(y, points + 96 * i + 48, 48);
    valid[i] = !(fq_is_zero(x) && fq_is_zero(y));
    fq_mul(xs[i], x, R2);
    fq_mul(ys[i], y, R2);
  }

  g1 *window_out = (g1 *)calloc(W, sizeof(g1));
  pthread_t threads[64];
  task_t tasks[64];
  int per = (W + n_threads - 1) / n_threads;
  int nt = 0;
  for (int t = 0; t < n_threads; t++) {
    int b = t * per, e = b + per;
    if (e > W) e = W;
    if (b >= e) break;
    tasks[nt] = (task_t){xs, ys, valid, scalars, n, c, b, e, window_out};
    pthread_create(&threads[nt], NULL, window_worker, &tasks[nt]);
    nt++;
  }
  for (int t = 0; t < nt; t++) pthread_join(threads[t], NULL);

  /* combine: result = sum_w 2^(c*w) T_w, Horner from the top */
  g1 acc = window_out[W - 1];
  for (int w = W - 2; w >= 0; w--) {
    for (int d = 0; d < c; d++) g1_dbl(&acc, &acc);
    g1_add(&acc, &acc, &window_out[w]);
  }

  /* Montgomery -> plain */
  fq one = {1, 0, 0, 0, 0, 0}, X, Y, Z;
  fq_mul(X, acc.X, one);
  fq_mul(Y, acc.Y, one);
  fq_mul(Z, acc.Z, one);
  memcpy(out, X, 48);
  memcpy(out + 48, Y, 48);
  memcpy(out + 96, Z, 48);

  free(xs);
  free(ys);
  free(valid);
  free(window_out);
}

/* ---- Fp2 = Fp[u]/(u^2+1) ---- */

typedef struct {
  fq c0, c1;
} fp2;

static inline int fp2_is_zero(const fp2 *a) {
  return fq_is_zero(a->c0) && fq_is_zero(a->c1);
}

static inline void fp2_add(fp2 *out, const fp2 *a, const fp2 *b) {
  fq_add(out->c0, a->c0, b->c0);
  fq_add(out->c1, a->c1, b->c1);
}

static inline void fp2_sub(fp2 *out, const fp2 *a, const fp2 *b) {
  fq_sub(out->c0, a->c0, b->c0);
  fq_sub(out->c1, a->c1, b->c1);
}

static inline void fp2_dbl(fp2 *out, const fp2 *a) { fp2_add(out, a, a); }

/* Karatsuba: (a0+a1u)(b0+b1u) = a0b0 - a1b1 + ((a0+a1)(b0+b1)-a0b0-a1b1)u */
static void fp2_mul(fp2 *out, const fp2 *a, const fp2 *b) {
  fq t0, t1, sa, sb, m;
  fq_mul(t0, a->c0, b->c0);
  fq_mul(t1, a->c1, b->c1);
  fq_add(sa, a->c0, a->c1);
  fq_add(sb, b->c0, b->c1);
  fq_mul(m, sa, sb);
  fq_sub(out->c1, m, t0);
  fq_sub(out->c1, out->c1, t1);
  fq_sub(out->c0, t0, t1);
}

/* (a0+a1u)^2 = (a0+a1)(a0-a1) + 2a0a1 u */
static void fp2_sqr(fp2 *out, const fp2 *a) {
  fq s, d, m;
  fq_add(s, a->c0, a->c1);
  fq_sub(d, a->c0, a->c1);
  fq_mul(m, a->c0, a->c1);
  fq_mul(out->c0, s, d);
  fq_dbl(out->c1, m);
}

/* ---- G2 Jacobian (Montgomery coordinates); same formulas as G1 ---- */

typedef struct {
  fp2 X, Y, Z;
} g2;

static const g2 G2_ZERO;

static inline int g2_is_inf(const g2 *p) { return fp2_is_zero(&p->Z); }

static void g2_dbl(g2 *out, const g2 *p) {
  if (g2_is_inf(p)) {
    *out = *p;
    return;
  }
  fp2 A, B, C, D, E, F, t;
  fp2_sqr(&A, &p->X);
  fp2_sqr(&B, &p->Y);
  fp2_sqr(&C, &B);
  fp2_add(&t, &p->X, &B);
  fp2_sqr(&D, &t);
  fp2_sub(&D, &D, &A);
  fp2_sub(&D, &D, &C);
  fp2_dbl(&D, &D);
  fp2_dbl(&E, &A);
  fp2_add(&E, &E, &A);
  fp2_sqr(&F, &E);
  g2 r;
  fp2_sub(&r.X, &F, &D);
  fp2_sub(&r.X, &r.X, &D);
  fp2_dbl(&t, &C);
  fp2_dbl(&t, &t);
  fp2_dbl(&t, &t); /* 8C */
  fp2_sub(&r.Y, &D, &r.X);
  fp2_mul(&r.Y, &r.Y, &E);
  fp2_sub(&r.Y, &r.Y, &t);
  fp2_mul(&r.Z, &p->Y, &p->Z);
  fp2_dbl(&r.Z, &r.Z);
  *out = r;
}

static void g2_madd(g2 *out, const g2 *p, const fp2 *x2, const fp2 *y2) {
  if (g2_is_inf(p)) {
    out->X = *x2;
    out->Y = *y2;
    memcpy(out->Z.c0, FQ_ONE, 48);
    memset(out->Z.c1, 0, 48);
    return;
  }
  fp2 Z1Z1, U2, S2, H, HH, I, J, r, V, t;
  fp2_sqr(&Z1Z1, &p->Z);
  fp2_mul(&U2, x2, &Z1Z1);
  fp2_mul(&S2, y2, &p->Z);
  fp2_mul(&S2, &S2, &Z1Z1);
  fp2_sub(&H, &U2, &p->X);
  fp2_sub(&r, &S2, &p->Y);
  if (fp2_is_zero(&H)) {
    if (fp2_is_zero(&r)) {
      g2_dbl(out, p);
      return;
    }
    *out = G2_ZERO;
    return;
  }
  fp2_dbl(&r, &r);
  fp2_sqr(&HH, &H);
  fp2_dbl(&I, &HH);
  fp2_dbl(&I, &I);
  fp2_mul(&J, &H, &I);
  fp2_mul(&V, &p->X, &I);
  g2 o;
  fp2_sqr(&o.X, &r);
  fp2_sub(&o.X, &o.X, &J);
  fp2_sub(&o.X, &o.X, &V);
  fp2_sub(&o.X, &o.X, &V);
  fp2_sub(&t, &V, &o.X);
  fp2_mul(&o.Y, &r, &t);
  fp2_mul(&t, &p->Y, &J);
  fp2_dbl(&t, &t);
  fp2_sub(&o.Y, &o.Y, &t);
  fp2_add(&t, &p->Z, &H);
  fp2_sqr(&o.Z, &t);
  fp2_sub(&o.Z, &o.Z, &Z1Z1);
  fp2_sub(&o.Z, &o.Z, &HH);
  *out = o;
}

static void g2_add(g2 *out, const g2 *p, const g2 *q) {
  if (g2_is_inf(p)) {
    *out = *q;
    return;
  }
  if (g2_is_inf(q)) {
    *out = *p;
    return;
  }
  fp2 Z1Z1, Z2Z2, U1, U2, S1, S2, H, I, J, r, V, t;
  fp2_sqr(&Z1Z1, &p->Z);
  fp2_sqr(&Z2Z2, &q->Z);
  fp2_mul(&U1, &p->X, &Z2Z2);
  fp2_mul(&U2, &q->X, &Z1Z1);
  fp2_mul(&S1, &p->Y, &q->Z);
  fp2_mul(&S1, &S1, &Z2Z2);
  fp2_mul(&S2, &q->Y, &p->Z);
  fp2_mul(&S2, &S2, &Z1Z1);
  fp2_sub(&H, &U2, &U1);
  fp2_sub(&r, &S2, &S1);
  if (fp2_is_zero(&H)) {
    if (fp2_is_zero(&r)) {
      g2_dbl(out, p);
      return;
    }
    *out = G2_ZERO;
    return;
  }
  fp2_dbl(&r, &r);
  fp2_dbl(&t, &H);
  fp2_sqr(&I, &t);
  fp2_mul(&J, &H, &I);
  fp2_mul(&V, &U1, &I);
  g2 o;
  fp2_sqr(&o.X, &r);
  fp2_sub(&o.X, &o.X, &J);
  fp2_sub(&o.X, &o.X, &V);
  fp2_sub(&o.X, &o.X, &V);
  fp2_sub(&t, &V, &o.X);
  fp2_mul(&o.Y, &r, &t);
  fp2_mul(&t, &S1, &J);
  fp2_dbl(&t, &t);
  fp2_sub(&o.Y, &o.Y, &t);
  fp2_add(&t, &p->Z, &q->Z);
  fp2_sqr(&o.Z, &t);
  fp2_sub(&o.Z, &o.Z, &Z1Z1);
  fp2_sub(&o.Z, &o.Z, &Z2Z2);
  fp2_mul(&o.Z, &o.Z, &H);
  *out = o;
}

/* ---- G2 Pippenger (same windowed scheme as G1) ---- */

typedef struct {
  const fp2 *xs;
  const fp2 *ys;
  const uint8_t *valid;
  const uint8_t *scalars;
  uint64_t n;
  int c;
  int w_begin, w_end;
  g2 *window_out;
} task2_t;

static void *window_worker_g2(void *arg) {
  task2_t *t = (task2_t *)arg;
  int nb = 1 << t->c;
  g2 *buckets = (g2 *)calloc(nb, sizeof(g2));
  for (int w = t->w_begin; w < t->w_end; w++) {
    memset(buckets, 0, (size_t)nb * sizeof(g2));
    for (uint64_t i = 0; i < t->n; i++) {
      if (t->valid && !t->valid[i]) continue;
      uint32_t d = digit_of(t->scalars + 32 * i, w, t->c);
      if (d) g2_madd(&buckets[d], &buckets[d], &t->xs[i], &t->ys[i]);
    }
    g2 run = G2_ZERO, tot = G2_ZERO;
    for (int b = nb - 1; b >= 1; b--) {
      g2_add(&run, &run, &buckets[b]);
      g2_add(&tot, &tot, &run);
    }
    t->window_out[w] = tot;
  }
  free(buckets);
  return NULL;
}

/* points: n*192 B plain LE affine (x.c0 | x.c1 | y.c0 | y.c1);
 * scalars: n*32 B LE. out: 288 B plain LE Jacobian (X0|X1|Y0|Y1|Z0|Z1). */
void msm_g2_cpu(const uint8_t *points, const uint8_t *scalars, uint64_t n,
                int c, int n_threads, uint8_t *out) {
  if (c <= 0) {
    int l = 0;
    for (uint64_t v = n; v > 1; v >>= 1) l++;
    c = l - 3;
    if (c < 4) c = 4;
    if (c > 16) c = 16;
  }
  int W = (255 + c - 1) / c;
  if (n_threads <= 0) n_threads = 4;
  if (n_threads > W) n_threads = W;

  fp2 *xs = (fp2 *)malloc(n * sizeof(fp2));
  fp2 *ys = (fp2 *)malloc(n * sizeof(fp2));
  uint8_t *valid = (uint8_t *)malloc(n);
  for (uint64_t i = 0; i < n; i++) {
    fp2 x, y;
    memcpy(x.c0, points + 192 * i, 48);
    memcpy(x.c1, points + 192 * i + 48, 48);
    memcpy(y.c0, points + 192 * i + 96, 48);
    memcpy(y.c1, points + 192 * i + 144, 48);
    valid[i] = !(fp2_is_zero(&x) && fp2_is_zero(&y));
    fq_mul(xs[i].c0, x.c0, R2);
    fq_mul(xs[i].c1, x.c1, R2);
    fq_mul(ys[i].c0, y.c0, R2);
    fq_mul(ys[i].c1, y.c1, R2);
  }

  g2 *window_out = (g2 *)calloc(W, sizeof(g2));
  pthread_t threads[64];
  task2_t tasks[64];
  int per = (W + n_threads - 1) / n_threads;
  int nt = 0;
  for (int t = 0; t < n_threads; t++) {
    int b = t * per, e = b + per;
    if (e > W) e = W;
    if (b >= e) break;
    tasks[nt] = (task2_t){xs, ys, valid, scalars, n, c, b, e, window_out};
    pthread_create(&threads[nt], NULL, window_worker_g2, &tasks[nt]);
    nt++;
  }
  for (int t = 0; t < nt; t++) pthread_join(threads[t], NULL);

  g2 acc = window_out[W - 1];
  for (int w = W - 2; w >= 0; w--) {
    for (int d = 0; d < c; d++) g2_dbl(&acc, &acc);
    g2_add(&acc, &acc, &window_out[w]);
  }

  fq one = {1, 0, 0, 0, 0, 0};
  fp2 X, Y, Z;
  fq_mul(X.c0, acc.X.c0, one);
  fq_mul(X.c1, acc.X.c1, one);
  fq_mul(Y.c0, acc.Y.c0, one);
  fq_mul(Y.c1, acc.Y.c1, one);
  fq_mul(Z.c0, acc.Z.c0, one);
  fq_mul(Z.c1, acc.Z.c1, one);
  memcpy(out, X.c0, 48);
  memcpy(out + 48, X.c1, 48);
  memcpy(out + 96, Y.c0, 48);
  memcpy(out + 144, Y.c1, 48);
  memcpy(out + 192, Z.c0, 48);
  memcpy(out + 240, Z.c1, 48);

  free(xs);
  free(ys);
  free(valid);
  free(window_out);
}
