// Drop-in for /root/reference/test/minunit.h that RECORDS assertion
// failures instead of aborting, so one mismatched problem cannot kill
// the whole baseline sweep.

#pragma once

#include <iostream>

extern int mu_failures;

inline void mu_assert(const char *message, bool f)
{
    if (not f) {
        std::cout << "{\"assert_failed\": \"" << message << "\"}"
                  << std::endl;
        mu_failures++;
    }
}

extern int tests_run;

template <typename fun> char *mu_run_test(fun test)
{
    char *message = test();
    tests_run++;
    if (message) return message;
    return 0;
}
