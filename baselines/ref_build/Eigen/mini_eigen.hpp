// mini_eigen.hpp — a from-scratch, minimal Eigen-compatible API subset,
// written for ONE purpose: compiling the reference EiCOS sources
// (/root/reference/src/eicos.cpp, which we must NOT modify or copy) so a
// true reference baseline (exit codes, objectives, ITERATION COUNTS) can
// be measured in this image, where the real Eigen library is unavailable
// (no /usr/include/eigen3, no network egress; verified).
//
// Covers exactly the API surface eicos.cpp/eicos.hpp use (audited by
// grep, see baselines/ref_build/README.md): VectorXd/VectorXi with
// head/tail/segment views, coefficient-wise ops, lp norms; CSC
// SparseMatrix<double> with InnerIterator, setFromTriplets, coeffRef,
// raw CSC pointers, transpose, matvec; Map<> for the raw-CSC ctor; and
// SimplicialLDLT (simplicial up-looking LDL^T with an RCM fill-reducing
// ordering — the reference uses AMD inside Eigen; ordering affects fill
// and speed only, not iterate semantics, which is what this baseline
// measures).
//
// Everything here is eager (no expression templates) — built for
// correctness and determinism, not peak speed.  This file contains no
// code derived from Eigen; the algorithms (etree / up-looking LDL /
// RCM / CSC ops) are textbook (Davis, "Direct Methods for Sparse
// Linear Systems").

#pragma once

#include <algorithm>
#include <cassert>
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <limits>
#include <optional>
#include <type_traits>
#include <string>
#include <utility>
#include <vector>

namespace Eigen
{

constexpr int Infinity = -1;
enum ComputationInfo { Success = 0, NumericalIssue = 1, InvalidInput = 2 };
enum UpLoType { Lower = 1, Upper = 2 };

template <typename T> class DenseVector;
template <typename T> class CommaInit;
using VectorXd = DenseVector<double>;
using VectorXi = DenseVector<int>;

// ---------------------------------------------------------------- views
// Writable view over a contiguous slice of a DenseVector.  Read usage
// converts to a concrete DenseVector; write methods mutate in place.
template <typename T> class ArrayProxy
{
  public:
    ArrayProxy(T *p, long n) : p_(p), n_(n) {}
    ArrayProxy &operator+=(T a)
    {
        for (long i = 0; i < n_; i++) p_[i] += a;
        return *this;
    }
    ArrayProxy &operator-=(T a)
    {
        for (long i = 0; i < n_; i++) p_[i] -= a;
        return *this;
    }
    ArrayProxy &operator*=(T a)
    {
        for (long i = 0; i < n_; i++) p_[i] *= a;
        return *this;
    }

  private:
    T *p_;
    long n_;
};

template <typename T> class Seg
{
  public:
    using NC = typename std::remove_const<T>::type;
    Seg(T *p, long n) : p_(p), n_(n) {}
    long size() const { return n_; }
    T &operator()(long i) { return p_[i]; }
    const T &operator()(long i) const { return p_[i]; }

    operator DenseVector<NC>() const;

    template <typename V> Seg &operator=(const V &v)
    {
        assign_(v);
        return *this;
    }
    Seg &operator=(const Seg &v)
    {
        assign_(v);
        return *this;
    }
    template <typename V> Seg &operator+=(const V &v)
    {
        for (long i = 0; i < n_; i++) p_[i] += v(i);
        return *this;
    }
    template <typename V> Seg &operator-=(const V &v)
    {
        for (long i = 0; i < n_; i++) p_[i] -= v(i);
        return *this;
    }
    Seg &operator*=(T a)
    {
        for (long i = 0; i < n_; i++) p_[i] *= a;
        return *this;
    }
    void setZero()
    {
        for (long i = 0; i < n_; i++) p_[i] = T(0);
    }
    void setConstant(T a)
    {
        for (long i = 0; i < n_; i++) p_[i] = a;
    }
    ArrayProxy<T> array() { return ArrayProxy<T>(p_, n_); }

    class SegComma
    {
      public:
        SegComma(T *p, long off) : p_(p), off_(off) {}
        SegComma &operator,(const DenseVector<NC> &x)
        {
            for (long i = 0; i < x.size(); i++) p_[off_ + i] = x(i);
            off_ += x.size();
            return *this;
        }

      private:
        T *p_;
        long off_;
    };
    SegComma operator<<(const DenseVector<NC> &x)
    {
        for (long i = 0; i < x.size(); i++) p_[i] = x(i);
        return SegComma(p_, x.size());
    }

    T sum() const
    {
        T s = 0;
        for (long i = 0; i < n_; i++) s += p_[i];
        return s;
    }
    double norm() const { return std::sqrt(squaredNorm()); }
    double squaredNorm() const
    {
        double s = 0;
        for (long i = 0; i < n_; i++) s += double(p_[i]) * double(p_[i]);
        return s;
    }
    template <int P> double lpNorm() const
    {
        double s = 0;
        if (P == 1)
            for (long i = 0; i < n_; i++) s += std::fabs(double(p_[i]));
        else
            for (long i = 0; i < n_; i++)
                s = std::max(s, std::fabs(double(p_[i])));
        return s;
    }
    T minCoeff() const
    {
        assert(n_ > 0);
        T s = p_[0];
        for (long i = 1; i < n_; i++) s = std::min(s, p_[i]);
        return s;
    }
    template <typename V> double dot(const V &v) const
    {
        double s = 0;
        for (long i = 0; i < n_; i++) s += double(p_[i]) * double(v(i));
        return s;
    }
    template <typename V> DenseVector<NC> cwiseProduct(const V &v) const;
    template <typename V> DenseVector<NC> cwiseQuotient(const V &v) const;
    DenseVector<NC> cwiseSqrt() const;

  private:
    template <typename V> void assign_(const V &v)
    {
        // materialize first: aliasing (self-assignment through views)
        std::vector<NC> tmp(static_cast<size_t>(n_));
        for (long i = 0; i < n_; i++) tmp[i] = v(i);
        for (long i = 0; i < n_; i++) p_[i] = tmp[i];
    }
    T *p_;
    long n_;
};

// --------------------------------------------------------------- vector
template <typename T> class DenseVector
{
  public:
    DenseVector() {}
    explicit DenseVector(long n) : v_(size_t(n), T(0)) {}
    long size() const { return long(v_.size()); }
    long rows() const { return size(); }
    void resize(long n) { v_.assign(size_t(n), T(0)); }
    T &operator()(long i) { return v_[size_t(i)]; }
    const T &operator()(long i) const { return v_[size_t(i)]; }
    T &operator[](long i) { return v_[size_t(i)]; }
    const T &operator[](long i) const { return v_[size_t(i)]; }
    T *data() { return v_.data(); }
    const T *data() const { return v_.data(); }

    void setZero() { std::fill(v_.begin(), v_.end(), T(0)); }
    void setOnes() { std::fill(v_.begin(), v_.end(), T(1)); }
    void setConstant(T a) { std::fill(v_.begin(), v_.end(), a); }

    Seg<T> head(long n) { return Seg<T>(v_.data(), n); }
    Seg<const T> head(long n) const { return Seg<const T>(v_.data(), n); }
    Seg<T> tail(long n) { return Seg<T>(v_.data() + size() - n, n); }
    Seg<const T> tail(long n) const
    {
        return Seg<const T>(v_.data() + size() - n, n);
    }
    Seg<T> segment(long i, long n) { return Seg<T>(v_.data() + i, n); }
    Seg<const T> segment(long i, long n) const
    {
        return Seg<const T>(v_.data() + i, n);
    }
    ArrayProxy<T> array() { return ArrayProxy<T>(v_.data(), size()); }

    CommaInit<T> operator<<(const DenseVector &x)
    {
        for (long i = 0; i < x.size(); i++) v_[size_t(i)] = x(i);
        return CommaInit<T>(this, x.size());
    }

    T sum() const
    {
        T s = 0;
        for (const T &x : v_) s += x;
        return s;
    }
    double norm() const { return std::sqrt(squaredNorm()); }
    double squaredNorm() const
    {
        double s = 0;
        for (const T &x : v_) s += double(x) * double(x);
        return s;
    }
    template <int P> double lpNorm() const
    {
        double s = 0;
        if (P == 1)
            for (const T &x : v_) s += std::fabs(double(x));
        else
            for (const T &x : v_) s = std::max(s, std::fabs(double(x)));
        return s;
    }
    T minCoeff() const
    {
        assert(!v_.empty());
        return *std::min_element(v_.begin(), v_.end());
    }
    T maxCoeff() const
    {
        assert(!v_.empty());
        return *std::max_element(v_.begin(), v_.end());
    }
    bool hasNaN() const
    {
        for (const T &x : v_)
            if (std::isnan(double(x))) return true;
        return false;
    }
    template <typename V> double dot(const V &v) const
    {
        double s = 0;
        for (long i = 0; i < size(); i++) s += double(v_[i]) * double(v(i));
        return s;
    }
    template <typename V> DenseVector cwiseProduct(const V &v) const
    {
        DenseVector r(size());
        for (long i = 0; i < size(); i++) r(i) = v_[i] * v(i);
        return r;
    }
    template <typename V> DenseVector cwiseQuotient(const V &v) const
    {
        DenseVector r(size());
        for (long i = 0; i < size(); i++) r(i) = v_[i] / v(i);
        return r;
    }
    DenseVector cwiseSqrt() const
    {
        DenseVector r(size());
        for (long i = 0; i < size(); i++) r(i) = T(std::sqrt(double(v_[i])));
        return r;
    }
    template <typename F> DenseVector unaryExpr(F f) const
    {
        DenseVector r(size());
        for (long i = 0; i < size(); i++) r(i) = f(v_[i]);
        return r;
    }

    DenseVector &operator+=(const DenseVector &o)
    {
        for (long i = 0; i < size(); i++) v_[i] += o(i);
        return *this;
    }
    DenseVector &operator-=(const DenseVector &o)
    {
        for (long i = 0; i < size(); i++) v_[i] -= o(i);
        return *this;
    }
    DenseVector &operator*=(T a)
    {
        for (T &x : v_) x *= a;
        return *this;
    }
    DenseVector &operator/=(T a)
    {
        for (T &x : v_) x /= a;
        return *this;
    }

  private:
    std::vector<T> v_;
};

template <typename T> Seg<T>::operator DenseVector<typename Seg<T>::NC>() const
{
    DenseVector<NC> r(n_);
    for (long i = 0; i < n_; i++) r(i) = p_[i];
    return r;
}
template <typename T>
template <typename V>
DenseVector<typename Seg<T>::NC> Seg<T>::cwiseProduct(const V &v) const
{
    DenseVector<NC> r(n_);
    for (long i = 0; i < n_; i++) r(i) = p_[i] * v(i);
    return r;
}
template <typename T>
template <typename V>
DenseVector<typename Seg<T>::NC> Seg<T>::cwiseQuotient(const V &v) const
{
    DenseVector<NC> r(n_);
    for (long i = 0; i < n_; i++) r(i) = p_[i] / v(i);
    return r;
}
template <typename T> DenseVector<typename Seg<T>::NC> Seg<T>::cwiseSqrt() const
{
    DenseVector<NC> r(n_);
    for (long i = 0; i < n_; i++) r(i) = NC(std::sqrt(double(p_[i])));
    return r;
}


// comma initializer: v << a, b, c;  (concatenation into v)
template <typename T> class CommaInit
{
  public:
    CommaInit(DenseVector<T> *v, long off) : v_(v), off_(off) {}
    CommaInit &operator,(const DenseVector<T> &x)
    {
        for (long i = 0; i < x.size(); i++) (*v_)(off_ + i) = x(i);
        off_ += x.size();
        return *this;
    }

  private:
    DenseVector<T> *v_;
    long off_;
};

// free operators (namespace Eigen => found by ADL for Seg too, with the
// implicit Seg -> DenseVector conversion)
inline VectorXd operator+(const VectorXd &a, const VectorXd &b)
{
    VectorXd r(a.size());
    for (long i = 0; i < a.size(); i++) r(i) = a(i) + b(i);
    return r;
}
inline VectorXd operator-(const VectorXd &a, const VectorXd &b)
{
    VectorXd r(a.size());
    for (long i = 0; i < a.size(); i++) r(i) = a(i) - b(i);
    return r;
}
inline VectorXd operator-(const VectorXd &a)
{
    VectorXd r(a.size());
    for (long i = 0; i < a.size(); i++) r(i) = -a(i);
    return r;
}
inline VectorXd operator*(double a, const VectorXd &v)
{
    VectorXd r(v.size());
    for (long i = 0; i < v.size(); i++) r(i) = a * v(i);
    return r;
}
inline VectorXd operator*(const VectorXd &v, double a) { return a * v; }
inline VectorXd operator/(const VectorXd &v, double a)
{
    VectorXd r(v.size());
    for (long i = 0; i < v.size(); i++) r(i) = v(i) / a;
    return r;
}

// --------------------------------------------------------------- sparse
template <typename T> class Triplet
{
  public:
    Triplet() : r_(0), c_(0), v_(0) {}
    Triplet(long r, long c, T v) : r_(r), c_(c), v_(v) {}
    long row() const { return r_; }
    long col() const { return c_; }
    T value() const { return v_; }

  private:
    long r_, c_;
    T v_;
};

template <typename T> class SparseMatrixT
{
  public:
    static constexpr bool IsRowMajor = false;
    SparseMatrixT() : rows_(0), cols_(0), outer_(1, 0) {}
    SparseMatrixT(long r, long c) : rows_(r), cols_(c), outer_(size_t(c) + 1, 0)
    {
    }
    long rows() const { return rows_; }
    long cols() const { return cols_; }
    long outerSize() const { return cols_; }
    long nonZeros() const { return long(vals_.size()); }
    void resize(long r, long c)
    {
        rows_ = r;
        cols_ = c;
        outer_.assign(size_t(c) + 1, 0);
        inner_.clear();
        vals_.clear();
    }
    void reserve(long n)
    {
        inner_.reserve(static_cast<size_t>(n));
        vals_.reserve(static_cast<size_t>(n));
    }
    void setZero()
    {
        outer_.assign(size_t(cols_) + 1, 0);
        inner_.clear();
        vals_.clear();
    }
    T *valuePtr() { return vals_.data(); }
    const T *valuePtr() const { return vals_.data(); }
    int *innerIndexPtr() { return inner_.data(); }
    const int *innerIndexPtr() const { return inner_.data(); }
    int *outerIndexPtr() { return outer_.data(); }
    const int *outerIndexPtr() const { return outer_.data(); }

    template <typename It> void setFromTriplets(It begin, It end)
    {
        // counting sort by column; duplicates are summed (and explicit
        // zeros kept) exactly like Eigen, so cached value pointers into
        // the CSC array stay meaningful
        std::vector<long> cnt(size_t(cols_) + 1, 0);
        for (It it = begin; it != end; ++it) cnt[size_t(it->col()) + 1]++;
        for (long j = 0; j < cols_; j++) cnt[size_t(j) + 1] += cnt[size_t(j)];
        long nnz = cnt[size_t(cols_)];
        std::vector<int> ri(static_cast<size_t>(nnz));
        std::vector<T> rv(static_cast<size_t>(nnz));
        std::vector<long> pos(cnt.begin(), cnt.end() - 1);
        for (It it = begin; it != end; ++it) {
            long p = pos[size_t(it->col())]++;
            ri[size_t(p)] = int(it->row());
            rv[size_t(p)] = it->value();
        }
        outer_.assign(size_t(cols_) + 1, 0);
        inner_.clear();
        vals_.clear();
        inner_.reserve(static_cast<size_t>(nnz));
        vals_.reserve(static_cast<size_t>(nnz));
        std::vector<std::pair<int, T>> colbuf;
        for (long j = 0; j < cols_; j++) {
            colbuf.clear();
            for (long p = cnt[size_t(j)]; p < cnt[size_t(j) + 1]; p++)
                colbuf.emplace_back(ri[size_t(p)], rv[size_t(p)]);
            std::sort(colbuf.begin(), colbuf.end(),
                      [](const std::pair<int, T> &a,
                         const std::pair<int, T> &b) {
                          return a.first < b.first;
                      });
            for (size_t k = 0; k < colbuf.size(); k++) {
                if (!inner_.empty() && long(inner_.size()) > outer_[size_t(j)]
                    && inner_.back() == colbuf[k].first) {
                    vals_.back() += colbuf[k].second;  // merge duplicate
                } else {
                    inner_.push_back(colbuf[k].first);
                    vals_.push_back(colbuf[k].second);
                }
            }
            outer_[size_t(j) + 1] = int(inner_.size());
        }
    }

    T &coeffRef(long i, long j)
    {
        for (long p = outer_[size_t(j)]; p < outer_[size_t(j) + 1]; p++)
            if (inner_[size_t(p)] == int(i)) return vals_[size_t(p)];
        // the reference only takes coeffRef on slots created by
        // setFromTriplets (cacheIndices); inserting here would
        // invalidate previously cached pointers, so fail loudly
        std::fprintf(stderr,
                     "mini_eigen: coeffRef(%ld,%ld) on missing slot\n", i, j);
        std::abort();
    }

    SparseMatrixT transpose() const
    {
        SparseMatrixT t(cols_, rows_);
        std::vector<long> cnt(size_t(rows_) + 1, 0);
        for (int r : inner_) cnt[size_t(r) + 1]++;
        for (long i = 0; i < rows_; i++) cnt[size_t(i) + 1] += cnt[size_t(i)];
        t.inner_.resize(vals_.size());
        t.vals_.resize(vals_.size());
        std::vector<long> pos(cnt.begin(), cnt.end() - 1);
        for (long j = 0; j < cols_; j++)
            for (long p = outer_[size_t(j)]; p < outer_[size_t(j) + 1]; p++) {
                long q = pos[size_t(inner_[size_t(p)])]++;
                t.inner_[size_t(q)] = int(j);
                t.vals_[size_t(q)] = vals_[size_t(p)];
            }
        for (long i = 0; i <= rows_; i++) t.outer_[size_t(i)] = int(cnt[size_t(i)]);
        return t;
    }

    VectorXd operator*(const VectorXd &x) const
    {
        VectorXd y(rows_);
        for (long j = 0; j < cols_; j++) {
            const double xj = x(j);
            for (long p = outer_[size_t(j)]; p < outer_[size_t(j) + 1]; p++)
                y(inner_[size_t(p)]) += vals_[size_t(p)] * xj;
        }
        return y;
    }
    SparseMatrixT operator-() const
    {
        SparseMatrixT r(*this);
        for (T &v : r.vals_) v = -v;
        return r;
    }

    class InnerIterator
    {
      public:
        InnerIterator(SparseMatrixT &m, long j)
            : m_(&m), cm_(&m), p_(m.outer_[size_t(j)]),
              end_(m.outer_[size_t(j) + 1]), j_(j)
        {
        }
        InnerIterator(const SparseMatrixT &m, long j)
            : m_(nullptr), cm_(&m), p_(m.outer_[size_t(j)]),
              end_(m.outer_[size_t(j) + 1]), j_(j)
        {
        }
        operator bool() const { return p_ < end_; }
        InnerIterator &operator++()
        {
            p_++;
            return *this;
        }
        long row() const { return cm_->inner_[size_t(p_)]; }
        long col() const { return j_; }
        long index() const { return row(); }
        T value() const { return cm_->vals_[size_t(p_)]; }
        T &valueRef()
        {
            assert(m_);
            return m_->vals_[size_t(p_)];
        }

      private:
        SparseMatrixT *m_;
        const SparseMatrixT *cm_;
        long p_, end_, j_;
    };

  private:
    long rows_, cols_;
    std::vector<int> outer_;
    std::vector<int> inner_;
    std::vector<T> vals_;
};

template <typename T = double, int Options = 0, typename Index = int>
using SparseMatrix = SparseMatrixT<T>;

// ------------------------------------------------------------------ Map
template <typename M> struct Map;

template <> struct Map<VectorXd> : VectorXd
{
    Map(const double *p, long n) : VectorXd(n)
    {
        for (long i = 0; i < n; i++) (*this)(i) = p ? p[i] : 0.0;
    }
};
template <> struct Map<VectorXi> : VectorXi
{
    template <typename I> Map(const I *p, long n) : VectorXi(n)
    {
        for (long i = 0; i < n; i++) (*this)(i) = p ? int(p[i]) : 0;
    }
};
template <> struct Map<SparseMatrixT<double>> : SparseMatrixT<double>
{
    template <typename I>
    Map(long rows, long cols, long nnz, const I *outer, const I *inner,
        const double *vals)
        : SparseMatrixT<double>(rows, cols)
    {
        std::vector<Triplet<double>> trips;
        trips.reserve(static_cast<size_t>(nnz));
        for (long j = 0; j < cols; j++)
            for (long p = long(outer[j]); p < long(outer[j + 1]); p++)
                trips.emplace_back(long(inner[p]), j, vals[p]);
        setFromTriplets(trips.begin(), trips.end());
    }
};

// ---------------------------------------------------- SimplicialLDLT
// Simplicial up-looking LDL^T over the elimination tree (textbook
// algorithm) with an RCM fill-reducing pre-ordering.  Input is the
// UPPER triangle of a symmetric quasidefinite matrix, as declared by
// the UpLo template argument the reference uses.
template <typename MatType, int UpLo = Lower> class SimplicialLDLT
{
  public:
    void analyzePattern(const MatType &K)
    {
        n_ = K.cols();
        // upper-triangle pattern (row <= col) straight from K
        std::vector<std::vector<int>> adj{static_cast<size_t>(n_)};
        const int *Kp = K.outerIndexPtr();
        const int *Ki = K.innerIndexPtr();
        for (long j = 0; j < n_; j++)
            for (long p = Kp[j]; p < Kp[j + 1]; p++) {
                long i = Ki[p];
                if (i == j) continue;
                long lo = std::min(i, j), hi = std::max(i, j);
                adj[size_t(lo)].push_back(int(hi));
                adj[size_t(hi)].push_back(int(lo));
            }
        const char *ord = std::getenv("MINI_EIGEN_ORDER");
        if (ord && std::string(ord) == "natural") {
            perm_.resize(static_cast<size_t>(n_));
            for (long k = 0; k < n_; k++) perm_[size_t(k)] = int(k);
        } else if (ord && std::string(ord) == "reverse") {
            perm_.resize(static_cast<size_t>(n_));
            for (long k = 0; k < n_; k++) perm_[size_t(k)] = int(n_ - 1 - k);
        } else {
            perm_ = rcm_(adj);
        }
        iperm_.assign(size_t(n_), 0);
        for (long k = 0; k < n_; k++) iperm_[size_t(perm_[size_t(k)])] = int(k);

        // permuted upper pattern + a map from K's nnz slots into it
        long nnz = K.nonZeros();
        std::vector<std::vector<std::pair<int, int>>> cols{static_cast<size_t>(n_)};
        long slot = 0;
        for (long j = 0; j < n_; j++)
            for (long p = Kp[j]; p < Kp[j + 1]; p++, slot++) {
                long i = Ki[p];
                if (i > j) continue;  // reference stores upper only
                long pi = iperm_[size_t(i)], pj = iperm_[size_t(j)];
                long lo = std::min(pi, pj), hi = std::max(pi, pj);
                cols[size_t(hi)].emplace_back(int(lo), int(slot));
            }
        Ap_.assign(size_t(n_) + 1, 0);
        Ai_.clear();
        kmap_.assign(size_t(nnz), -1);
        for (long j = 0; j < n_; j++) {
            std::sort(cols[size_t(j)].begin(), cols[size_t(j)].end());
            for (auto &e : cols[size_t(j)]) {
                kmap_[size_t(e.second)] = int(Ai_.size());
                Ai_.push_back(e.first);
            }
            Ap_[size_t(j) + 1] = int(Ai_.size());
        }
        Ax_.assign(Ai_.size(), 0.0);

        // elimination tree + column counts (symbolic, Davis LDL)
        parent_.assign(size_t(n_), -1);
        std::vector<int> flag(static_cast<size_t>(n_));
        std::vector<int> Lnz(size_t(n_), 0);
        for (long j = 0; j < n_; j++) {
            parent_[size_t(j)] = -1;
            flag[size_t(j)] = int(j);
            for (long p = Ap_[size_t(j)]; p < Ap_[size_t(j) + 1]; p++) {
                long i = Ai_[size_t(p)];
                while (flag[size_t(i)] != int(j)) {
                    if (parent_[size_t(i)] == -1) parent_[size_t(i)] = int(j);
                    Lnz[size_t(i)]++;
                    flag[size_t(i)] = int(j);
                    i = parent_[size_t(i)];
                }
            }
        }
        Lp_.assign(size_t(n_) + 1, 0);
        for (long j = 0; j < n_; j++)
            Lp_[size_t(j) + 1] = Lp_[size_t(j)] + Lnz[size_t(j)];
        Li_.assign(size_t(Lp_[size_t(n_)]), 0);
        Lx_.assign(size_t(Lp_[size_t(n_)]), 0.0);
        D_.assign(size_t(n_), 0.0);
        analyzed_ = true;
    }

    void factorize(const MatType &K)
    {
        if (!analyzed_) analyzePattern(K);
        // scatter K's (fixed-order) values into the permuted upper CSC
        const int *Kp = K.outerIndexPtr();
        const int *Ki = K.innerIndexPtr();
        const double *Kx = K.valuePtr();
        std::fill(Ax_.begin(), Ax_.end(), 0.0);
        long slot = 0;
        for (long j = 0; j < K.cols(); j++)
            for (long p = Kp[j]; p < Kp[j + 1]; p++, slot++) {
                (void)Ki;
                if (kmap_[size_t(slot)] >= 0)
                    Ax_[size_t(kmap_[size_t(slot)])] += Kx[p];
            }

        // numeric up-looking factorization
        std::vector<double> Y(size_t(n_), 0.0);
        std::vector<int> pattern(static_cast<size_t>(n_)), flag(static_cast<size_t>(n_)),
            lnz(size_t(n_), 0);
        info_ = Success;
        for (long j = 0; j < n_; j++) {
            long top = n_;
            flag[size_t(j)] = int(j);
            for (long p = Ap_[size_t(j)]; p < Ap_[size_t(j) + 1]; p++) {
                long i = Ai_[size_t(p)];
                Y[size_t(i)] += Ax_[size_t(p)];
                long len = 0;
                std::vector<int> st;
                for (; flag[size_t(i)] != int(j); i = parent_[size_t(i)]) {
                    st.push_back(int(i));
                    flag[size_t(i)] = int(j);
                    len++;
                }
                while (len > 0) pattern[size_t(--top)] = st[size_t(--len)];
            }
            D_[size_t(j)] = Y[size_t(j)];
            Y[size_t(j)] = 0.0;
            for (; top < n_; top++) {
                long k = pattern[size_t(top)];
                double yk = Y[size_t(k)];
                Y[size_t(k)] = 0.0;
                for (long p = Lp_[size_t(k)]; p < Lp_[size_t(k)] + lnz[size_t(k)];
                     p++)
                    Y[size_t(Li_[size_t(p)])] -= Lx_[size_t(p)] * yk;
                double ljk = yk / D_[size_t(k)];
                D_[size_t(j)] -= ljk * yk;
                Li_[size_t(Lp_[size_t(k)] + lnz[size_t(k)])] = int(j);
                Lx_[size_t(Lp_[size_t(k)] + lnz[size_t(k)])] = ljk;
                lnz[size_t(k)]++;
            }
            if (D_[size_t(j)] == 0.0) info_ = NumericalIssue;
        }
    }

    VectorXd solve(const VectorXd &b) const
    {
        std::vector<double> y(static_cast<size_t>(n_));
        for (long k = 0; k < n_; k++) y[size_t(k)] = b(perm_[size_t(k)]);
        for (long j = 0; j < n_; j++) {
            const double yj = y[size_t(j)];
            for (long p = Lp_[size_t(j)]; p < Lp_[size_t(j) + 1]; p++)
                y[size_t(Li_[size_t(p)])] -= Lx_[size_t(p)] * yj;
        }
        for (long j = 0; j < n_; j++) y[size_t(j)] /= D_[size_t(j)];
        for (long j = n_ - 1; j >= 0; j--) {
            double s = y[size_t(j)];
            for (long p = Lp_[size_t(j)]; p < Lp_[size_t(j) + 1]; p++)
                s -= Lx_[size_t(p)] * y[size_t(Li_[size_t(p)])];
            y[size_t(j)] = s;
        }
        VectorXd x(n_);
        for (long k = 0; k < n_; k++) x(perm_[size_t(k)]) = y[size_t(k)];
        return x;
    }

    ComputationInfo info() const { return info_; }

  private:
    static std::vector<int> rcm_(std::vector<std::vector<int>> &adj)
    {
        long n = long(adj.size());
        for (auto &a : adj) {
            std::sort(a.begin(), a.end());
            a.erase(std::unique(a.begin(), a.end()), a.end());
        }
        std::vector<int> order;
        order.reserve(static_cast<size_t>(n));
        std::vector<char> seen(size_t(n), 0);
        std::vector<int> nodes(static_cast<size_t>(n));
        for (long i = 0; i < n; i++) nodes[size_t(i)] = int(i);
        std::sort(nodes.begin(), nodes.end(), [&](int a, int b) {
            return adj[size_t(a)].size() < adj[size_t(b)].size();
        });
        for (int s : nodes) {
            if (seen[size_t(s)]) continue;
            size_t qh = order.size();
            order.push_back(s);
            seen[size_t(s)] = 1;
            while (qh < order.size()) {
                int u = order[qh++];
                std::vector<int> nb;
                for (int v : adj[size_t(u)])
                    if (!seen[size_t(v)]) nb.push_back(v);
                std::sort(nb.begin(), nb.end(), [&](int a, int b) {
                    return adj[size_t(a)].size() < adj[size_t(b)].size();
                });
                for (int v : nb) {
                    seen[size_t(v)] = 1;
                    order.push_back(v);
                }
            }
        }
        std::reverse(order.begin(), order.end());
        return order;
    }

    long n_ = 0;
    bool analyzed_ = false;
    ComputationInfo info_ = Success;
    std::vector<int> perm_, iperm_, parent_;
    std::vector<int> Ap_, Ai_, kmap_;
    std::vector<double> Ax_;
    std::vector<int> Lp_, Li_;
    std::vector<double> Lx_, D_;
};

}  // namespace Eigen
