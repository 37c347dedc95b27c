// Active drop-in for /root/reference/include/printing.hpp (which is a
// no-op without the fmt library).  Implements just enough of fmt's
// format-spec mini-language ({}, {:2d}, {:+5.3e}, {:6.4f}, ...) on top
// of snprintf for the reference's verbose iteration table — so the
// baseline runs can be inspected live.

#pragma once

#include <cstdio>
#include <string>

constexpr bool debug_printing = false;

namespace mini_fmt
{

inline void render_one(std::string &out, const std::string &spec, double v)
{
    char buf[64];
    std::string s = spec.empty() ? std::string("g") : spec;
    std::snprintf(buf, sizeof buf, ("%" + s).c_str(), v);
    out += buf;
}
inline void render_one(std::string &out, const std::string &spec, long long v)
{
    char buf[64];
    if (spec.empty()) {
        std::snprintf(buf, sizeof buf, "%lld", v);
    } else if (spec.back() == 'd') {
        std::string s = spec.substr(0, spec.size() - 1) + "lld";
        std::snprintf(buf, sizeof buf, ("%" + s).c_str(), v);
    } else {  // an int formatted with e/f/g spec
        render_one(out, spec, double(v));
        return;
    }
    out += buf;
}
inline void render_one(std::string &out, const std::string &spec,
                       const std::string &v)
{
    (void)spec;
    out += v;
}
inline void render_one(std::string &out, const std::string &spec,
                       const char *v)
{
    (void)spec;
    out += v;
}
template <typename T>
inline typename std::enable_if<std::is_integral<T>::value>::type
render(std::string &out, const std::string &spec, T v)
{
    render_one(out, spec, static_cast<long long>(v));
}
template <typename T>
inline typename std::enable_if<std::is_floating_point<T>::value>::type
render(std::string &out, const std::string &spec, T v)
{
    render_one(out, spec, double(v));
}
inline void render(std::string &out, const std::string &spec,
                   const std::string &v)
{
    render_one(out, spec, v);
}
inline void render(std::string &out, const std::string &spec, const char *v)
{
    render_one(out, spec, v);
}

inline void format_impl(std::string &out, const char *&f) { out += f; }

template <typename T, typename... Rest>
void format_impl(std::string &out, const char *&f, T &&first, Rest &&...rest)
{
    while (*f) {
        if (*f == '{' && *(f + 1) == '{') {
            out += '{';
            f += 2;
        } else if (*f == '}' && *(f + 1) == '}') {
            out += '}';
            f += 2;
        } else if (*f == '{') {
            const char *close = f + 1;
            while (*close && *close != '}') close++;
            std::string spec;
            const char *colon = f + 1;
            while (colon < close && *colon != ':') colon++;
            if (colon < close) spec.assign(colon + 1, close);
            render(out, spec, std::forward<T>(first));
            f = close + (*close == '}');
            format_impl(out, f, std::forward<Rest>(rest)...);
            return;
        } else {
            out += *f++;
        }
    }
}

}  // namespace mini_fmt

template <typename... Params>
std::string format(const char *f, Params &&...params)
{
    std::string out;
    const char *p = f;
    mini_fmt::format_impl(out, p, std::forward<Params>(params)...);
    return out;
}
inline std::string format(const std::string &f) { return f; }
template <typename... Params>
std::string format(const std::string &f, Params &&...params)
{
    return format(f.c_str(), std::forward<Params>(params)...);
}

template <typename... Params> void print(const char *f, Params &&...params)
{
    std::fputs(format(f, std::forward<Params>(params)...).c_str(), stdout);
    std::fflush(stdout);
}
template <typename... Params>
void print(const std::string &f, Params &&...params)
{
    print(f.c_str(), std::forward<Params>(params)...);
}

template <typename... Params> void print_dbg(Params &&...params)
{
    if constexpr (debug_printing) {
        print(std::forward<Params>(params)...);
    }
}
