// Native batched environment pool (the EnvPool role in the reference:
// pyproject.toml envpool dep + highlevel/env.py:323-360 integration).
//
// Implements classic-control dynamics (CartPole-v1, Pendulum-v1) in C++
// with struct-of-arrays state, stepping all instances across a persistent
// thread pool and writing results into caller-provided (pinned) numpy
// buffers — zero Python work per env per step.  Auto-reset follows the
// same semantics as the Python/JAX vector envs: the `obs` output keeps the
// terminal observation while `carry_obs` holds the fresh episode's reset
// observation.
//
// Exposed through a plain C API consumed via ctypes
// (tianshou_tpu/envs/cpp_pool.py) — no pybind11 dependency.

#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <functional>
#include <mutex>
#include <thread>
#include <vector>

namespace {

constexpr double PI = 3.14159265358979323846;

// SplitMix64: small, fast, per-env PRNG
struct Rng {
  uint64_t s;
  explicit Rng(uint64_t seed) : s(seed) {}
  uint64_t next_u64() {
    uint64_t z = (s += 0x9E3779B97f4A7C15ULL);
    z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ULL;
    z = (z ^ (z >> 27)) * 0x94D049BB133111EBULL;
    return z ^ (z >> 31);
  }
  double uniform() {  // [0, 1)
    return (next_u64() >> 11) * (1.0 / 9007199254740992.0);
  }
  double uniform(double lo, double hi) { return lo + (hi - lo) * uniform(); }
};

struct ThreadPool {
  explicit ThreadPool(int n) : stop_(false), pending_(0) {
    for (int i = 0; i < n; ++i) {
      workers_.emplace_back([this] {
        for (;;) {
          std::function<void()> job;
          {
            std::unique_lock<std::mutex> lk(mu_);
            cv_.wait(lk, [this] { return stop_ || !jobs_.empty(); });
            if (stop_ && jobs_.empty()) return;
            job = std::move(jobs_.back());
            jobs_.pop_back();
          }
          job();
          if (pending_.fetch_sub(1) == 1) {
            std::lock_guard<std::mutex> lk(done_mu_);
            done_cv_.notify_all();
          }
        }
      });
    }
  }
  ~ThreadPool() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& w : workers_) w.join();
  }
  void run_chunks(int total, const std::function<void(int, int)>& fn) {
    int n = static_cast<int>(workers_.size());
    if (n <= 1 || total < 2 * n) {
      fn(0, total);
      return;
    }
    int chunk = (total + n - 1) / n;
    int njobs = (total + chunk - 1) / chunk;
    pending_.store(njobs);
    {
      std::lock_guard<std::mutex> lk(mu_);
      for (int j = 0; j < njobs; ++j) {
        int lo = j * chunk, hi = std::min(total, lo + chunk);
        jobs_.emplace_back([=] { fn(lo, hi); });
      }
    }
    cv_.notify_all();
    std::unique_lock<std::mutex> lk(done_mu_);
    done_cv_.wait(lk, [this] { return pending_.load() == 0; });
  }

 private:
  std::vector<std::thread> workers_;
  std::vector<std::function<void()>> jobs_;
  std::mutex mu_, done_mu_;
  std::condition_variable cv_, done_cv_;
  bool stop_;
  std::atomic<int> pending_;
};

enum class EnvKind { kCartPole, kPendulum, kMountainCar, kAcrobot, kReacher };

struct Pool {
  EnvKind kind;
  int num_envs;
  int obs_dim;
  int act_dim;   // continuous action dims (0 for discrete)
  bool discrete;
  std::vector<double> state;  // [num_envs * state_dim]
  std::vector<int> t;
  std::vector<Rng> rngs;
  ThreadPool threads;

  Pool(EnvKind k, int n, uint64_t seed, int nthreads)
      : kind(k), num_envs(n), threads(nthreads) {
    switch (kind) {
      case EnvKind::kCartPole:
        obs_dim = 4; act_dim = 0; discrete = true; state.resize(n * 4);
        break;
      case EnvKind::kPendulum:
        obs_dim = 3; act_dim = 1; discrete = false; state.resize(n * 2);
        break;
      case EnvKind::kMountainCar:
        obs_dim = 2; act_dim = 0; discrete = true; state.resize(n * 2);
        break;
      case EnvKind::kAcrobot:
        obs_dim = 6; act_dim = 0; discrete = true; state.resize(n * 4);
        break;
      case EnvKind::kReacher:
        // state: [t1, t2, dt1, dt2, target_x, target_y]
        obs_dim = 10; act_dim = 2; discrete = false; state.resize(n * 6);
        break;
    }
    t.assign(n, 0);
    rngs.reserve(n);
    for (int i = 0; i < n; ++i) rngs.emplace_back(seed + 0x1000 * i + 1);
  }

  // ---- CartPole-v1 dynamics ------------------------------------------
  void cartpole_reset(int i, float* obs) {
    double* s = &state[i * 4];
    for (int k = 0; k < 4; ++k) s[k] = rngs[i].uniform(-0.05, 0.05);
    t[i] = 0;
    for (int k = 0; k < 4; ++k) obs[k] = static_cast<float>(s[k]);
  }
  void cartpole_step(int i, double force_sign, float* obs, float* rew,
                     uint8_t* term, uint8_t* trunc, float* carry) {
    constexpr double kG = 9.8, kMc = 1.0, kMp = 0.1, kL = 0.5, kF = 10.0,
                     kTau = 0.02, kXLim = 2.4;
    const double kThetaLim = 12.0 * 2.0 * PI / 360.0;
    double* s = &state[i * 4];
    double x = s[0], xd = s[1], th = s[2], thd = s[3];
    double force = force_sign > 0.5 ? kF : -kF;
    double costh = std::cos(th), sinth = std::sin(th);
    double total_mass = kMc + kMp, pml = kMp * kL;
    double temp = (force + pml * thd * thd * sinth) / total_mass;
    double thacc = (kG * sinth - costh * temp) /
                   (kL * (4.0 / 3.0 - kMp * costh * costh / total_mass));
    double xacc = temp - pml * thacc * costh / total_mass;
    x += kTau * xd; xd += kTau * xacc; th += kTau * thd; thd += kTau * thacc;
    s[0] = x; s[1] = xd; s[2] = th; s[3] = thd;
    t[i] += 1;
    bool terminated = std::fabs(x) > kXLim || std::fabs(th) > kThetaLim;
    bool truncated = !terminated && t[i] >= 500;
    obs[0] = (float)x; obs[1] = (float)xd; obs[2] = (float)th; obs[3] = (float)thd;
    *rew = 1.0f;
    *term = terminated; *trunc = truncated;
    if (terminated || truncated) {
      cartpole_reset(i, carry);
    } else {
      std::memcpy(carry, obs, 4 * sizeof(float));
    }
  }

  // ---- Pendulum-v1 dynamics ------------------------------------------
  void pendulum_obs(int i, float* obs) {
    double* s = &state[i * 2];
    obs[0] = (float)std::cos(s[0]);
    obs[1] = (float)std::sin(s[0]);
    obs[2] = (float)s[1];
  }
  void pendulum_reset(int i, float* obs) {
    double* s = &state[i * 2];
    s[0] = rngs[i].uniform(-PI, PI);
    s[1] = rngs[i].uniform(-1.0, 1.0);
    t[i] = 0;
    pendulum_obs(i, obs);
  }
  void pendulum_step(int i, double u, float* obs, float* rew, uint8_t* term,
                     uint8_t* trunc, float* carry) {
    constexpr double kSpeed = 8.0, kTorque = 2.0, kDt = 0.05, kG = 10.0,
                     kM = 1.0, kL = 1.0;
    double* s = &state[i * 2];
    double th = s[0], thd = s[1];
    u = std::min(kTorque, std::max(-kTorque, u));
    double th_norm = std::fmod(th + PI, 2.0 * PI);
    if (th_norm < 0) th_norm += 2.0 * PI;
    th_norm -= PI;
    double cost = th_norm * th_norm + 0.1 * thd * thd + 0.001 * u * u;
    thd += (3.0 * kG / (2.0 * kL) * std::sin(th) +
            3.0 / (kM * kL * kL) * u) * kDt;
    thd = std::min(kSpeed, std::max(-kSpeed, thd));
    th += thd * kDt;
    s[0] = th; s[1] = thd;
    t[i] += 1;
    bool truncated = t[i] >= 200;
    pendulum_obs(i, obs);
    *rew = (float)(-cost);
    *term = 0; *trunc = truncated;
    if (truncated) {
      pendulum_reset(i, carry);
    } else {
      std::memcpy(carry, obs, 3 * sizeof(float));
    }
  }

  // ---- MountainCar-v0 dynamics ----------------------------------------
  // gym spec: force 0.001, gravity 0.0025, bounds [-1.2, 0.6], max speed
  // 0.07, goal 0.5, reward -1 per step, 200-step truncation
  void mountaincar_reset(int i, float* obs) {
    double* s = &state[i * 2];
    s[0] = rngs[i].uniform(-0.6, -0.4);
    s[1] = 0.0;
    t[i] = 0;
    obs[0] = (float)s[0]; obs[1] = (float)s[1];
  }
  void mountaincar_step(int i, double a, float* obs, float* rew,
                        uint8_t* term, uint8_t* trunc, float* carry) {
    constexpr double kForce = 0.001, kGravity = 0.0025;
    constexpr double kMinPos = -1.2, kMaxPos = 0.6, kMaxSpeed = 0.07;
    constexpr double kGoalPos = 0.5, kGoalVel = 0.0;
    double* s = &state[i * 2];
    double pos = s[0], vel = s[1];
    int act = (int)(a + 0.5);  // {0, 1, 2}
    vel += (act - 1) * kForce + std::cos(3.0 * pos) * (-kGravity);
    vel = std::min(kMaxSpeed, std::max(-kMaxSpeed, vel));
    pos += vel;
    pos = std::min(kMaxPos, std::max(kMinPos, pos));
    if (pos <= kMinPos && vel < 0.0) vel = 0.0;
    s[0] = pos; s[1] = vel;
    t[i] += 1;
    bool terminated = pos >= kGoalPos && vel >= kGoalVel;
    bool truncated = !terminated && t[i] >= 200;
    obs[0] = (float)pos; obs[1] = (float)vel;
    *rew = -1.0f;
    *term = terminated; *trunc = truncated;
    if (terminated || truncated) mountaincar_reset(i, carry);
    else std::memcpy(carry, obs, 2 * sizeof(float));
  }

  // ---- Acrobot-v1 dynamics ---------------------------------------------
  // gym spec ("book" variant): unit links/masses, dt 0.2 with one RK4
  // step, velocity clips 4pi/9pi, terminal -cos(t1) - cos(t1+t2) > 1,
  // reward -1 per step (0 on the terminal step), 500-step truncation
  static void acrobot_dsdt(const double* s, double torque, double* ds) {
    constexpr double kG = 9.8, kL1 = 1.0, kLc1 = 0.5, kLc2 = 0.5,
                     kM1 = 1.0, kM2 = 1.0, kI1 = 1.0, kI2 = 1.0;
    double t1 = s[0], t2 = s[1], dt1 = s[2], dt2 = s[3];
    double d1 = kM1 * kLc1 * kLc1 +
                kM2 * (kL1 * kL1 + kLc2 * kLc2 +
                       2.0 * kL1 * kLc2 * std::cos(t2)) + kI1 + kI2;
    double d2 = kM2 * (kLc2 * kLc2 + kL1 * kLc2 * std::cos(t2)) + kI2;
    double phi2 = kM2 * kLc2 * kG * std::cos(t1 + t2 - PI / 2.0);
    double phi1 = -kM2 * kL1 * kLc2 * dt2 * dt2 * std::sin(t2) -
                  2.0 * kM2 * kL1 * kLc2 * dt2 * dt1 * std::sin(t2) +
                  (kM1 * kLc1 + kM2 * kL1) * kG * std::cos(t1 - PI / 2.0) +
                  phi2;
    double ddt2 = (torque + (d2 / d1) * phi1 -
                   kM2 * kL1 * kLc2 * dt1 * dt1 * std::sin(t2) - phi2) /
                  (kM2 * kLc2 * kLc2 + kI2 - d2 * d2 / d1);
    double ddt1 = -(d2 * ddt2 + phi1) / d1;
    ds[0] = dt1; ds[1] = dt2; ds[2] = ddt1; ds[3] = ddt2;
  }
  static double wrap_pi(double x) {
    x = std::fmod(x + PI, 2.0 * PI);
    if (x < 0) x += 2.0 * PI;
    return x - PI;
  }
  void acrobot_obs(int i, float* obs) {
    double* s = &state[i * 4];
    obs[0] = (float)std::cos(s[0]); obs[1] = (float)std::sin(s[0]);
    obs[2] = (float)std::cos(s[1]); obs[3] = (float)std::sin(s[1]);
    obs[4] = (float)s[2]; obs[5] = (float)s[3];
  }
  void acrobot_reset(int i, float* obs) {
    double* s = &state[i * 4];
    for (int k = 0; k < 4; ++k) s[k] = rngs[i].uniform(-0.1, 0.1);
    t[i] = 0;
    acrobot_obs(i, obs);
  }
  void acrobot_step(int i, double a, float* obs, float* rew, uint8_t* term,
                    uint8_t* trunc, float* carry) {
    constexpr double kDt = 0.2;
    const double kMaxVel1 = 4.0 * PI, kMaxVel2 = 9.0 * PI;
    double* s = &state[i * 4];
    double torque = (double)((int)(a + 0.5) - 1);  // {0,1,2} -> {-1,0,1}
    // one RK4 step of size dt (gym rk4 with ts=[0, dt])
    double k1[4], k2[4], k3[4], k4[4], tmp[4];
    acrobot_dsdt(s, torque, k1);
    for (int k = 0; k < 4; ++k) tmp[k] = s[k] + 0.5 * kDt * k1[k];
    acrobot_dsdt(tmp, torque, k2);
    for (int k = 0; k < 4; ++k) tmp[k] = s[k] + 0.5 * kDt * k2[k];
    acrobot_dsdt(tmp, torque, k3);
    for (int k = 0; k < 4; ++k) tmp[k] = s[k] + kDt * k3[k];
    acrobot_dsdt(tmp, torque, k4);
    for (int k = 0; k < 4; ++k)
      s[k] += kDt / 6.0 * (k1[k] + 2.0 * k2[k] + 2.0 * k3[k] + k4[k]);
    s[0] = wrap_pi(s[0]);
    s[1] = wrap_pi(s[1]);
    s[2] = std::min(kMaxVel1, std::max(-kMaxVel1, s[2]));
    s[3] = std::min(kMaxVel2, std::max(-kMaxVel2, s[3]));
    t[i] += 1;
    bool terminated = -std::cos(s[0]) - std::cos(s[1] + s[0]) > 1.0;
    bool truncated = !terminated && t[i] >= 500;
    acrobot_obs(i, obs);
    *rew = terminated ? 0.0f : -1.0f;
    *term = terminated; *trunc = truncated;
    if (terminated || truncated) acrobot_reset(i, carry);
    else std::memcpy(carry, obs, 6 * sizeof(float));
  }

  // ---- Reacher (2-link planar arm, own spec) ---------------------------
  // The expensive-simulator representative: full manipulator dynamics
  // with a 2x2 inertia-matrix solve inside an RK4 integrator, 4 substeps
  // per control step (16 dynamics evaluations per env step — two orders
  // of magnitude more arithmetic than CartPole).  Spec is our own (MuJoCo
  // Reacher-class, not byte-identical to it): links 0.1/0.11 m, torque
  // actions in [-1, 1] scaled by 0.05 Nm, viscous joint damping, random
  // reachable target, obs [cos q, sin q, target, qdot, fingertip-target],
  // reward -(dist + 0.1 ||a||^2), 50-step truncation (no termination).
  static void reacher_dsdt(const double* s, const double* tau, double* ds) {
    constexpr double kL1 = 0.1, kL2 = 0.11;      // link lengths
    constexpr double kM1 = 0.05, kM2 = 0.05;     // link masses
    constexpr double kDamp = 0.01;               // viscous damping
    const double lc1 = kL1 * 0.5, lc2 = kL2 * 0.5;
    const double i1 = kM1 * kL1 * kL1 / 12.0, i2 = kM2 * kL2 * kL2 / 12.0;
    double q2 = s[1], dq1 = s[2], dq2 = s[3];
    double c2 = std::cos(q2), s2 = std::sin(q2);
    // inertia matrix (planar horizontal arm: no gravity torques)
    double a11 = i1 + i2 + kM1 * lc1 * lc1 +
                 kM2 * (kL1 * kL1 + lc2 * lc2 + 2.0 * kL1 * lc2 * c2);
    double a12 = i2 + kM2 * (lc2 * lc2 + kL1 * lc2 * c2);
    double a22 = i2 + kM2 * lc2 * lc2;
    // Coriolis/centrifugal
    double h = kM2 * kL1 * lc2 * s2;
    double c1 = -h * dq2 * dq2 - 2.0 * h * dq1 * dq2;
    double cc2 = h * dq1 * dq1;
    double rhs1 = tau[0] - c1 - kDamp * dq1;
    double rhs2 = tau[1] - cc2 - kDamp * dq2;
    double det = a11 * a22 - a12 * a12;
    double ddq1 = (a22 * rhs1 - a12 * rhs2) / det;
    double ddq2 = (a11 * rhs2 - a12 * rhs1) / det;
    ds[0] = dq1; ds[1] = dq2; ds[2] = ddq1; ds[3] = ddq2;
  }
  void reacher_fingertip(const double* s, double* xy) {
    constexpr double kL1 = 0.1, kL2 = 0.11;
    xy[0] = kL1 * std::cos(s[0]) + kL2 * std::cos(s[0] + s[1]);
    xy[1] = kL1 * std::sin(s[0]) + kL2 * std::sin(s[0] + s[1]);
  }
  void reacher_obs(int i, float* obs) {
    double* s = &state[i * 6];
    double xy[2];
    reacher_fingertip(s, xy);
    obs[0] = (float)std::cos(s[0]); obs[1] = (float)std::cos(s[1]);
    obs[2] = (float)std::sin(s[0]); obs[3] = (float)std::sin(s[1]);
    obs[4] = (float)s[4]; obs[5] = (float)s[5];
    obs[6] = (float)s[2]; obs[7] = (float)s[3];
    obs[8] = (float)(xy[0] - s[4]); obs[9] = (float)(xy[1] - s[5]);
  }
  void reacher_reset(int i, float* obs) {
    double* s = &state[i * 6];
    s[0] = rngs[i].uniform(-PI, PI);
    s[1] = rngs[i].uniform(-PI, PI);
    s[2] = rngs[i].uniform(-0.05, 0.05);
    s[3] = rngs[i].uniform(-0.05, 0.05);
    // rejection-sample a target inside the reachable disc (radius 0.2)
    do {
      s[4] = rngs[i].uniform(-0.2, 0.2);
      s[5] = rngs[i].uniform(-0.2, 0.2);
    } while (s[4] * s[4] + s[5] * s[5] > 0.04);
    t[i] = 0;
    reacher_obs(i, obs);
  }
  void reacher_step(int i, const float* act, float* obs, float* rew,
                    uint8_t* term, uint8_t* trunc, float* carry) {
    constexpr double kDt = 0.01, kGear = 0.05;
    constexpr int kSubsteps = 4;
    double* s = &state[i * 6];
    double tau[2] = {
        kGear * std::min(1.0, std::max(-1.0, (double)act[0])),
        kGear * std::min(1.0, std::max(-1.0, (double)act[1]))};
    double k1[4], k2[4], k3[4], k4[4], tmp[4];
    for (int sub = 0; sub < kSubsteps; ++sub) {
      reacher_dsdt(s, tau, k1);
      for (int k = 0; k < 4; ++k) tmp[k] = s[k] + 0.5 * kDt * k1[k];
      reacher_dsdt(tmp, tau, k2);
      for (int k = 0; k < 4; ++k) tmp[k] = s[k] + 0.5 * kDt * k2[k];
      reacher_dsdt(tmp, tau, k3);
      for (int k = 0; k < 4; ++k) tmp[k] = s[k] + kDt * k3[k];
      reacher_dsdt(tmp, tau, k4);
      for (int k = 0; k < 4; ++k)
        s[k] += kDt / 6.0 * (k1[k] + 2.0 * k2[k] + 2.0 * k3[k] + k4[k]);
    }
    t[i] += 1;
    double xy[2];
    reacher_fingertip(s, xy);
    double dx = xy[0] - s[4], dy = xy[1] - s[5];
    double dist = std::sqrt(dx * dx + dy * dy);
    double ctrl = (double)act[0] * act[0] + (double)act[1] * act[1];
    bool truncated = t[i] >= 50;
    reacher_obs(i, obs);
    *rew = (float)(-(dist + 0.1 * ctrl));
    *term = 0; *trunc = truncated;
    if (truncated) reacher_reset(i, carry);
    else std::memcpy(carry, obs, 10 * sizeof(float));
  }

  void reset_all(float* obs_out) {
    threads.run_chunks(num_envs, [&](int lo, int hi) {
      for (int i = lo; i < hi; ++i) {
        float* obs = obs_out + (size_t)i * obs_dim;
        switch (kind) {
          case EnvKind::kCartPole: cartpole_reset(i, obs); break;
          case EnvKind::kPendulum: pendulum_reset(i, obs); break;
          case EnvKind::kMountainCar: mountaincar_reset(i, obs); break;
          case EnvKind::kAcrobot: acrobot_reset(i, obs); break;
          case EnvKind::kReacher: reacher_reset(i, obs); break;
        }
      }
    });
  }

  void step_all(const float* actions, float* obs_out, float* rew_out,
                uint8_t* term_out, uint8_t* trunc_out, float* carry_out) {
    threads.run_chunks(num_envs, [&](int lo, int hi) {
      for (int i = lo; i < hi; ++i) {
        float* obs = obs_out + (size_t)i * obs_dim;
        float* carry = carry_out + (size_t)i * obs_dim;
        switch (kind) {
          case EnvKind::kCartPole:
            cartpole_step(i, actions[i], obs, rew_out + i, term_out + i,
                          trunc_out + i, carry);
            break;
          case EnvKind::kPendulum:
            pendulum_step(i, actions[i], obs, rew_out + i, term_out + i,
                          trunc_out + i, carry);
            break;
          case EnvKind::kMountainCar:
            mountaincar_step(i, actions[i], obs, rew_out + i, term_out + i,
                             trunc_out + i, carry);
            break;
          case EnvKind::kAcrobot:
            acrobot_step(i, actions[i], obs, rew_out + i, term_out + i,
                         trunc_out + i, carry);
            break;
          case EnvKind::kReacher:
            reacher_step(i, actions + (size_t)i * act_dim, obs, rew_out + i,
                         term_out + i, trunc_out + i, carry);
            break;
        }
      }
    });
  }
};

}  // namespace

extern "C" {

void* envpool_create(const char* name, int num_envs, uint64_t seed,
                     int num_threads) {
  EnvKind kind;
  if (std::strcmp(name, "CartPole-v1") == 0) kind = EnvKind::kCartPole;
  else if (std::strcmp(name, "Pendulum-v1") == 0) kind = EnvKind::kPendulum;
  else if (std::strcmp(name, "MountainCar-v0") == 0) kind = EnvKind::kMountainCar;
  else if (std::strcmp(name, "Acrobot-v1") == 0) kind = EnvKind::kAcrobot;
  else if (std::strcmp(name, "Reacher2") == 0) kind = EnvKind::kReacher;
  else return nullptr;
  if (num_threads <= 0)
    num_threads = std::max(1u, std::thread::hardware_concurrency() / 2);
  return new Pool(kind, num_envs, seed, num_threads);
}

void envpool_destroy(void* p) { delete static_cast<Pool*>(p); }
int envpool_obs_dim(void* p) { return static_cast<Pool*>(p)->obs_dim; }
int envpool_discrete(void* p) { return static_cast<Pool*>(p)->discrete; }
int envpool_act_dim(void* p) { return static_cast<Pool*>(p)->act_dim; }

void envpool_reset(void* p, float* obs_out) {
  static_cast<Pool*>(p)->reset_all(obs_out);
}

void envpool_step(void* p, const float* actions, float* obs_out,
                  float* rew_out, uint8_t* term_out, uint8_t* trunc_out,
                  float* carry_out) {
  static_cast<Pool*>(p)->step_all(actions, obs_out, rew_out, term_out,
                                  trunc_out, carry_out);
}

}  // extern "C"
