#ifndef C4_YML_tree_SHIM
#define C4_YML_tree_SHIM
#include "../../ryml.hpp"
#endif
