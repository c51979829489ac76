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

#include <charconv>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
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
