#ifndef BOOKSIM_CONFIG_STUB
#define BOOKSIM_CONFIG_STUB
#include "booksim_lib.hpp"
#endif
