#ifndef C4_YML_node_type_SHIM
#define C4_YML_node_type_SHIM
#include "../../ryml.hpp"
#endif
