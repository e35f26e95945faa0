// Offline stub for the SANA-FE fork of Booksim2 (cycle-accurate NoC tier).
// The real library needs network access to fetch; simple/detailed timing
// models (used for golden generation) never call into it.
#ifndef BOOKSIM_LIB_STUB_HPP_
#define BOOKSIM_LIB_STUB_HPP_
#include <stdexcept>
#include <string>
#include <vector>

struct BookSimConfig {};

inline BookSimConfig booksim_load_config(std::vector<std::string> /*cfg*/)
{
    return {};
}
inline void booksim_close() {}
template <typename... Args>
inline void booksim_create_processing_event(Args&&... /*args*/)
{
    throw std::runtime_error("booksim stub: cycle-accurate model unavailable offline");
}
template <typename... Args>
inline void booksim_create_spike_event(Args&&... /*args*/)
{
    throw std::runtime_error("booksim stub: cycle-accurate model unavailable offline");
}
template <typename T>
inline double booksim_run(T /*config*/)
{
    throw std::runtime_error("booksim stub: cycle-accurate model unavailable offline");
}
#endif
