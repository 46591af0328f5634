# sequential recommenders registered here as they land
