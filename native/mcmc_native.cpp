// Host-side native verification oracle for the MCMC diagnostics.
//
// The reference implements all diagnostics as compiled native code (Rust:
// /root/reference/src/stats.rs, Rayon-parallel across parameters with
// rustfft for the autocovariance). In this framework the production
// diagnostics run on-device under XLA (mini_mcmc_tpu/stats.py); this C++
// library is the independent, framework-free implementation of the same
// math used to cross-validate the XLA results from the host:
//
//   - autocov_bf:      brute-force autocovariance (stats.rs:632-654 math)
//   - geyer_tau:       initial-monotone pairwise sums (stats.rs:518-543)
//   - split_rhat_ess:  the full split-chain pipeline (stats.rs:416-546):
//                      split halves -> within/pooled variance -> rho_t ->
//                      Geyer pairing -> rhat = sqrt(W/var), ESS = c*n/tau.
//
// OpenMP parallelism across parameters mirrors the reference's Rayon use.
// Built as a plain C ABI shared library; bound via ctypes
// (mini_mcmc_tpu/native.py).

#include <algorithm>
#include <charconv>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <numeric>
#include <vector>

extern "C" {

// data: [n, d] row-major; out: [n, d] row-major.
// out[lag, j] = sum_{t=0}^{n-lag-1} x[t,j] * x[t+lag,j] / n  on
// mean-subtracted columns.
void mcmc_autocov_bf(const float* data, int64_t n, int64_t d, float* out) {
#pragma omp parallel for
  for (int64_t j = 0; j < d; ++j) {
    double mean = 0.0;
    for (int64_t t = 0; t < n; ++t) mean += data[t * d + j];
    mean /= static_cast<double>(n);
    std::vector<float> x(n);
    for (int64_t t = 0; t < n; ++t)
      x[t] = static_cast<float>(data[t * d + j] - mean);
    for (int64_t lag = 0; lag < n; ++lag) {
      float acc = 0.0f;
      for (int64_t t = 0; t < n - lag; ++t) acc += x[t] * x[t + lag];
      out[lag * d + j] = acc / static_cast<float>(n);
    }
  }
}

// rho: [n, p] row-major. tau_out: [p].
// Pairs P_t = rho[2t] + rho[2t+1]; running minimum while positive;
// tau = -1 + 2 * sum(clipped P_t).
void mcmc_geyer_tau(const float* rho, int64_t n, int64_t p, float* tau_out) {
#pragma omp parallel for
  for (int64_t j = 0; j < p; ++j) {
    float out = 0.0f;
    float mn = (n >= 2) ? rho[0 * p + j] + rho[1 * p + j] : 0.0f;
    for (int64_t t = 0; t + 1 < n; t += 2) {
      float pt = rho[t * p + j] + rho[(t + 1) * p + j];
      if (pt <= 0.0f) break;
      if (pt > mn) pt = mn;
      mn = pt;
      out += pt;
    }
    tau_out[j] = -1.0f + 2.0f * out;
  }
}

// sample: [c, n, p] row-major. rhat_out, ess_out: [p].
// Full split-chain diagnostics pipeline.
void mcmc_split_rhat_ess(const float* sample, int64_t c, int64_t n, int64_t p,
                         float* rhat_out, float* ess_out) {
  const int64_t half = n / 2;
  const int64_t c2 = 2 * c;
  // splitted[i, t, j]: chain i of 2c, t < half.
  // first c chains: sample[i, 0..half); last c: sample[i-c, n-half..n).
  auto splitted_at = [&](int64_t i, int64_t t, int64_t j) -> float {
    if (i < c) return sample[i * n * p + t * p + j];
    return sample[(i - c) * n * p + (n - half + t) * p + j];
  };

#pragma omp parallel for
  for (int64_t j = 0; j < p; ++j) {
    // chain means
    std::vector<float> cm(c2);
    for (int64_t i = 0; i < c2; ++i) {
      double acc = 0.0;
      for (int64_t t = 0; t < half; ++t) acc += splitted_at(i, t, j);
      cm[i] = static_cast<float>(acc / static_cast<double>(half));
    }
    double om = 0.0;
    for (int64_t i = 0; i < c2; ++i) om += cm[i];
    om /= static_cast<double>(c2);

    // between: sum((cm - om)^2) * half / (c2 - 1)
    double b = 0.0;
    for (int64_t i = 0; i < c2; ++i) {
      double dlt = cm[i] - om;
      b += dlt * dlt;
    }
    b *= static_cast<double>(half) / static_cast<double>(c2 - 1);

    // within: mean over chains of biased per-chain variance
    double w = 0.0;
    for (int64_t i = 0; i < c2; ++i) {
      double acc = 0.0;
      for (int64_t t = 0; t < half; ++t) {
        double dlt = splitted_at(i, t, j) - cm[i];
        acc += dlt * dlt;
      }
      w += acc / static_cast<double>(half);
    }
    w /= static_cast<double>(c2);

    double var = (static_cast<double>(half) - 1.0) / half * w + b / half;
    rhat_out[j] = static_cast<float>(std::sqrt(w / var));

    // ESS: average autocovariance across split chains, then rho_t and
    // Geyer pairing.
    std::vector<float> avg_rho(half, 0.0f);
    std::vector<float> x(half);
    for (int64_t i = 0; i < c2; ++i) {
      for (int64_t t = 0; t < half; ++t) x[t] = splitted_at(i, t, j) - cm[i];
      for (int64_t lag = 0; lag < half; ++lag) {
        float acc = 0.0f;
        for (int64_t t = 0; t < half - lag; ++t) acc += x[t] * x[t + lag];
        avg_rho[lag] += acc / static_cast<float>(half);
      }
    }
    for (int64_t lag = 0; lag < half; ++lag)
      avg_rho[lag] /= static_cast<float>(c2);

    // rho_t = 1 - (W - avg_rho_t) / var
    std::vector<float> rho(half);
    for (int64_t t = 0; t < half; ++t)
      rho[t] = static_cast<float>(1.0 - (w - avg_rho[t]) / var);

    float out = 0.0f;
    float mn = (half >= 2) ? rho[0] + rho[1] : 0.0f;
    for (int64_t t = 0; t + 1 < half; t += 2) {
      float pt = rho[t] + rho[t + 1];
      if (pt <= 0.0f) break;
      if (pt > mn) pt = mn;
      mn = pt;
      out += pt;
    }
    float tau = -1.0f + 2.0f * out;
    ess_out[j] = static_cast<float>(c2) * static_cast<float>(half) / tau;
  }
}

// ---------------------------------------------------------------------
// Rank-normalized diagnostics oracle (Vehtari, Gelman, Simpson,
// Carpenter, Burkner 2021) — the independent cross-check for
// mini_mcmc_tpu/diagnostics.py (which is beyond-reference; the
// cross-implementation pattern follows the reference's FFT-vs-bruteforce
// self-check, /root/reference/src/stats.rs:777-808).
// ---------------------------------------------------------------------

// Acklam's rational approximation of the inverse normal CDF (~1.15e-9
// relative error) — far below the float32 pipeline it validates.
static double inv_normal_cdf(double p) {
  static const double a[] = {-3.969683028665376e+01, 2.209460984245205e+02,
                             -2.759285104469687e+02, 1.383577518672690e+02,
                             -3.066479806614716e+01, 2.506628277459239e+00};
  static const double b[] = {-5.447609879822406e+01, 1.615858368580409e+02,
                             -1.556989798598866e+02, 6.680131188771972e+01,
                             -1.328068155288572e+01};
  static const double c[] = {-7.784894002430293e-03, -3.223964580411365e-01,
                             -2.400758277161838e+00, -2.549732539343734e+00,
                             4.374664141464968e+00,  2.938163982698783e+00};
  static const double d[] = {7.784695709041462e-03, 3.224671290700398e-01,
                             2.445134137142996e+00, 3.754408661907416e+00};
  const double plow = 0.02425, phigh = 1.0 - plow;
  double q, r;
  if (p < plow) {
    q = std::sqrt(-2.0 * std::log(p));
    return (((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q +
            c[5]) /
           ((((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1.0);
  }
  if (p > phigh) {
    q = std::sqrt(-2.0 * std::log(1.0 - p));
    return -(((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q +
             c[5]) /
           ((((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1.0);
  }
  q = p - 0.5;
  r = q * q;
  return (((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4]) * r +
          a[5]) *
         q /
         (((((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r + b[4]) * r + 1.0);
}

// Ordinal (stable) ranks -> Blom-offset normal scores, matching
// diagnostics.py: z[i] = Phi^-1((rank_i + 1 - 3/8) / (S + 1/4)).
static void rank_normalize(const std::vector<float>& v,
                           std::vector<float>& z) {
  const int64_t s = static_cast<int64_t>(v.size());
  std::vector<int64_t> idx(s);
  std::iota(idx.begin(), idx.end(), 0);
  std::stable_sort(idx.begin(), idx.end(),
                   [&](int64_t a, int64_t b) { return v[a] < v[b]; });
  z.resize(s);
  for (int64_t r = 0; r < s; ++r) {
    double u = (static_cast<double>(r) + 0.625) /
               (static_cast<double>(s) + 0.25);
    z[idx[r]] = static_cast<float>(inv_normal_cdf(u));
  }
}

// Linear-interpolation quantile (numpy/jnp.quantile default method) of a
// COPY of v.
static double quantile_linear(std::vector<float> v, double level) {
  std::sort(v.begin(), v.end());
  const int64_t s = static_cast<int64_t>(v.size());
  double pos = level * static_cast<double>(s - 1);
  int64_t lo = static_cast<int64_t>(pos);
  if (lo >= s - 1) return v[s - 1];
  double frac = pos - static_cast<double>(lo);
  return (1.0 - frac) * v[lo] + frac * v[lo + 1];
}

// Split-chain W/var/ESS on ONE parameter's [c, n] buffer (row-major,
// draw t of chain i at buf[i*n + t]) — the same float accumulation
// discipline as mcmc_split_rhat_ess so Geyer pair cutoffs agree with the
// XLA float32 pipeline.
static void split_pipeline(const std::vector<float>& buf, int64_t c,
                           int64_t n, double* w_out, double* var_out,
                           float* ess_out) {
  const int64_t half = n / 2;
  const int64_t c2 = 2 * c;
  auto at = [&](int64_t i, int64_t t) -> float {
    if (i < c) return buf[i * n + t];
    return buf[(i - c) * n + (n - half + t)];
  };
  std::vector<float> cm(c2);
  for (int64_t i = 0; i < c2; ++i) {
    double acc = 0.0;
    for (int64_t t = 0; t < half; ++t) acc += at(i, t);
    cm[i] = static_cast<float>(acc / static_cast<double>(half));
  }
  double om = 0.0;
  for (int64_t i = 0; i < c2; ++i) om += cm[i];
  om /= static_cast<double>(c2);
  double b = 0.0;
  for (int64_t i = 0; i < c2; ++i) {
    double dlt = cm[i] - om;
    b += dlt * dlt;
  }
  b *= static_cast<double>(half) / static_cast<double>(c2 - 1);
  double w = 0.0;
  for (int64_t i = 0; i < c2; ++i) {
    double acc = 0.0;
    for (int64_t t = 0; t < half; ++t) {
      double dlt = at(i, t) - cm[i];
      acc += dlt * dlt;
    }
    w += acc / static_cast<double>(half);
  }
  w /= static_cast<double>(c2);
  double var = (static_cast<double>(half) - 1.0) / half * w + b / half;
  *w_out = w;
  *var_out = var;

  std::vector<float> avg_rho(half, 0.0f);
  std::vector<float> x(half);
  for (int64_t i = 0; i < c2; ++i) {
    for (int64_t t = 0; t < half; ++t) x[t] = at(i, t) - cm[i];
    for (int64_t lag = 0; lag < half; ++lag) {
      float acc = 0.0f;
      for (int64_t t = 0; t < half - lag; ++t) acc += x[t] * x[t + lag];
      avg_rho[lag] += acc / static_cast<float>(half);
    }
  }
  for (int64_t lag = 0; lag < half; ++lag)
    avg_rho[lag] /= static_cast<float>(c2);
  std::vector<float> rho(half);
  for (int64_t t = 0; t < half; ++t)
    rho[t] = static_cast<float>(1.0 - (w - avg_rho[t]) / var);
  float out = 0.0f;
  float mn = (half >= 2) ? rho[0] + rho[1] : 0.0f;
  for (int64_t t = 0; t + 1 < half; t += 2) {
    float pt = rho[t] + rho[t + 1];
    if (pt <= 0.0f) break;
    if (pt > mn) pt = mn;
    mn = pt;
    out += pt;
  }
  float tau = -1.0f + 2.0f * out;
  *ess_out = static_cast<float>(c2) * static_cast<float>(half) / tau;
}

// sample: [c, n, p] row-major. Outputs: [p] each.
// rhat_bulk / ess_bulk: standard-orientation split R-hat sqrt(var/W) and
// ESS of the rank-normalized draws; rhat_folded: same transform on
// |x - median|; ess_tail: min of the split ESS of the 5% / 95% quantile
// exceedance indicators (raw, un-normalized — diagnostics.py:129-143).
void mcmc_rank_normalized_diag(const float* sample, int64_t c, int64_t n,
                               int64_t p, float* rhat_bulk,
                               float* rhat_folded, float* ess_bulk,
                               float* ess_tail) {
  const int64_t s = c * n;
#pragma omp parallel for
  for (int64_t j = 0; j < p; ++j) {
    std::vector<float> v(s);
    for (int64_t i = 0; i < c; ++i)
      for (int64_t t = 0; t < n; ++t)
        v[i * n + t] = sample[i * n * p + t * p + j];

    std::vector<float> z;
    double w, var;
    float ess;

    rank_normalize(v, z);
    split_pipeline(z, c, n, &w, &var, &ess);
    rhat_bulk[j] = static_cast<float>(std::sqrt(var / w));
    ess_bulk[j] = ess;

    const double med = quantile_linear(v, 0.5);
    std::vector<float> folded(s);
    for (int64_t i = 0; i < s; ++i)
      folded[i] = std::fabs(v[i] - static_cast<float>(med));
    rank_normalize(folded, z);
    split_pipeline(z, c, n, &w, &var, &ess);
    rhat_folded[j] = static_cast<float>(std::sqrt(var / w));

    const double q05 = quantile_linear(v, 0.05);
    const double q95 = quantile_linear(v, 0.95);
    std::vector<float> ind(s);
    for (int64_t i = 0; i < s; ++i)
      ind[i] = v[i] <= static_cast<float>(q05) ? 1.0f : 0.0f;
    split_pipeline(ind, c, n, &w, &var, &ess);
    float ess_lo = ess;
    for (int64_t i = 0; i < s; ++i)
      ind[i] = v[i] >= static_cast<float>(q95) ? 1.0f : 0.0f;
    split_pipeline(ind, c, n, &w, &var, &ess);
    ess_tail[j] = ess_lo < ess ? ess_lo : ess;
  }
}

// Fast CSV export of the [c, n, d] sample cube (the runtime/IO layer the
// reference implements natively in Rust, /root/reference/src/io/csv.rs:
// 47-147). Schema: header "chain,observation,dim_0,..", one row per
// (chain, observation). Doubles are written with std::to_chars shortest
// round-trip formatting (the same guarantee as Python repr / Rust
// Display: parsing the text recovers the exact double). Returns 0 on
// success, nonzero on I/O failure.
int mcmc_save_csv_f64(const double* data, int64_t c, int64_t n, int64_t d,
                      const char* path) {
  std::FILE* f = std::fopen(path, "wb");
  if (!f) return 1;
  // Staging buffer, flushed when the headroom for one row (2 integers +
  // d doubles at <= 32 chars each) runs out; sized so that one full row
  // (and the header, which is shorter) ALWAYS fits even for huge d.
  const size_t row_max = 32 * (static_cast<size_t>(d) + 2);
  std::vector<char> buf(row_max * 2 > (1u << 20) ? row_max * 2
                                                 : (1u << 20));
  size_t pos = 0;
  auto flush = [&]() -> bool {
    bool ok = std::fwrite(buf.data(), 1, pos, f) == pos;
    pos = 0;
    return ok;
  };
  auto put_str = [&](const char* s, size_t len) {
    std::memcpy(buf.data() + pos, s, len);
    pos += len;
  };
  auto put_i64 = [&](int64_t v) {
    auto r = std::to_chars(buf.data() + pos, buf.data() + buf.size(), v);
    pos = static_cast<size_t>(r.ptr - buf.data());
  };
  auto put_f64 = [&](double v) {
    auto r = std::to_chars(buf.data() + pos, buf.data() + buf.size(), v);
    pos = static_cast<size_t>(r.ptr - buf.data());
  };

  put_str("chain,observation", 17);
  for (int64_t j = 0; j < d; ++j) {
    put_str(",dim_", 5);
    put_i64(j);
  }
  put_str("\n", 1);

  for (int64_t i = 0; i < c; ++i) {
    for (int64_t t = 0; t < n; ++t) {
      if (pos + row_max > buf.size() && !flush()) {
        std::fclose(f);
        return 2;
      }
      put_i64(i);
      buf[pos++] = ',';
      put_i64(t);
      const double* row = data + (i * n + t) * d;
      for (int64_t j = 0; j < d; ++j) {
        buf[pos++] = ',';
        put_f64(row[j]);
      }
      buf[pos++] = '\n';
    }
  }
  bool ok = flush();
  if (std::fclose(f) != 0) ok = false;
  return ok ? 0 : 2;
}

}  // extern "C"
